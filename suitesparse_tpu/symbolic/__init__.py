"""Symbolic analysis (reference: CHOLMOD/Cholesky symbolic + Supernodal symbolic)."""

from .etree import (col_counts, ereach, etree, first_descendants, postorder,
                    tree_depth, tree_levels)

__all__ = ["etree", "postorder", "ereach", "col_counts", "tree_levels",
           "tree_depth", "first_descendants"]
