"""Column-expression helpers and vectorized (Arrow) UDFs."""
