"""Sources & sinks: lake table format, CDC event generator, JSONL scan."""
