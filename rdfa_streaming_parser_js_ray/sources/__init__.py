"""Sources & sinks: the interleaved text+media documents table."""
