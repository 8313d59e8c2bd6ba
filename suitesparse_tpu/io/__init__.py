"""Matrix I/O: Matrix Market, Rutherford-Boeing, fixtures (reference layer L5)."""

from . import fixtures
from .matrix_market import read_matrix_market, write_matrix_market
from .rutherford_boeing import read_rb, write_rb
from .collection import Collection, default_collection, ssget

__all__ = ["fixtures", "read_matrix_market", "write_matrix_market",
           "read_rb", "write_rb", "Collection", "default_collection", "ssget"]
