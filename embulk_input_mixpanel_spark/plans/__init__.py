"""Driver-side planning: window ledgers, micro-batch plans, checkpoints."""
