"""Numeric factorization kernels (simplicial, supernodal, LU, QR, solves)."""
