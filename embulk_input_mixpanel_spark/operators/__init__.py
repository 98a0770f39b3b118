"""Relational + CDC operators: apply/merge, dedup family, similarity, text."""
