"""Matrix I/O: Matrix Market, Rutherford-Boeing, fixtures (reference layer L5)."""

from . import fixtures
from .matrix_market import read_matrix_market, write_matrix_market

__all__ = ["fixtures", "read_matrix_market", "write_matrix_market"]
