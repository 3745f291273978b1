"""Sources & sinks: text-format parsers and dataset I/O (SURVEY §2.1-2.2)."""
