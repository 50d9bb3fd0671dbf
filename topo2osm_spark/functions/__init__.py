"""Scalar/vectorized function library: cell index, projection, geometry."""
