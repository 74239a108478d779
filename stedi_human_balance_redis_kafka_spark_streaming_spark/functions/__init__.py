"""Column-expression function library (JVM-side, codegen-friendly)."""
