"""Scalar/vector similarity kernels (JVM expressions + Arrow UDFs)."""
