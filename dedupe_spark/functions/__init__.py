"""Scalar/vectorized kernels used inside Arrow-batched pandas UDFs."""
