"""Sources & sinks: corpus generation, table IO, partitioned output."""
