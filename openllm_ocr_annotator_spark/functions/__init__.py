"""Column-expression libraries (JVM-side where possible)."""
