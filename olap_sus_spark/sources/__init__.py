"""Sources & sinks: raw CSV landing zone, seed dimensions, Parquet warehouse."""
