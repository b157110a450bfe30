"""Column-level helper functions (JVM-side expressions where possible)."""
