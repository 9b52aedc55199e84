"""Scalar/aggregate function helpers shared by the operator library."""
