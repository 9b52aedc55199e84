"""Sources & sinks layer (SURVEY §2.1 S1-S10)."""
