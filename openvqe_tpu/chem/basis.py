"""Gaussian basis-set data and shell structures.

The reference delegates all of this to pyscf (``perform_pyscf_computation``,
reference molecule_factory.py:318-320); pyscf is not available here, so the
basis tables are built in from the published STO-3G definition:

STO-3G (Hehre, Stewart, Pople, JCP 51, 2657 (1969) and JCP 52, 2769 (1970))
is a least-squares 3-Gaussian expansion of Slater orbitals with *universal*
expansion exponents/coefficients for ζ=1, scaled per element by the standard
Slater exponents ζ (exponent scaling: alpha -> alpha * ζ^2).  The element ζ
values below reproduce the Basis Set Exchange STO-3G tables.

6-31G data (H, He) from the Basis Set Exchange tables.

Elements covered: every element used by the reference's molecule table
(molecule_factory.py:45-304): H, He, Li, Be, B, C, N, O, F, Ne, S, Cl.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

# Universal STO-3G expansions of Slater functions with ζ = 1 --------------

_STO3G_1S_EXP = np.array([2.227660584, 0.405771156, 0.109818])
_STO3G_1S_COEF = np.array([0.154328967, 0.535328142, 0.444634542])

_STO3G_2SP_EXP = np.array([0.994203, 0.231031, 0.0751386])
_STO3G_2S_COEF = np.array([-0.099967229, 0.399512826, 0.700115469])
_STO3G_2P_COEF = np.array([0.155916275, 0.607683719, 0.391957393])

_STO3G_3SP_EXP = np.array([0.4828540806, 0.1347150629, 0.0527272798])
_STO3G_3S_COEF = np.array([-0.219620369, 0.225595434, 0.900398426])
_STO3G_3P_COEF = np.array([0.010587604, 0.595167005, 0.462001012])

# Slater exponents ζ per element and shell (standard molecular values used
# by the published STO-3G tables).
_STO3G_ZETA: Dict[str, Tuple[float, ...]] = {
    "H": (1.24,),
    "He": (1.69,),
    "Li": (2.69, 0.80),
    "Be": (3.68, 1.15),
    "B": (4.68, 1.50),
    "C": (5.67, 1.72),
    "N": (6.67, 1.95),
    "O": (7.66, 2.25),
    "F": (8.65, 2.55),
    "Ne": (9.64, 2.88),
    "S": (15.47, 5.79, 2.05),
    "Cl": (16.43, 6.26, 2.10),
}

ATOMIC_NUMBER: Dict[str, int] = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18,
}

_631G: Dict[str, List[Tuple[int, List[float], List[float]]]] = {
    # (angular momentum, exponents, contraction coefficients)
    "H": [
        (0, [18.7311370, 2.8253937, 0.6401217],
            [0.03349460, 0.23472695, 0.81375733]),
        (0, [0.1612778], [1.0]),
    ],
    "He": [
        (0, [38.4216340, 5.7780300, 1.2417740],
            [0.0237660, 0.1546790, 0.4696300]),
        (0, [0.2979640], [1.0]),
    ],
}


@dataclass
class Shell:
    """A contracted Gaussian shell: all cartesian components of one l."""
    l: int                     # angular momentum (0=s, 1=p)
    center: np.ndarray         # position in bohr
    exps: np.ndarray
    coefs: np.ndarray          # contraction coefficients over *normalized* primitives
    atom_index: int


def _norm_prim(alpha: float, lmn: Tuple[int, int, int]) -> float:
    """Normalization constant of a cartesian Gaussian primitive x^l y^m z^n e^{-a r^2}."""
    l, m, n = lmn
    from scipy.special import factorial2
    df = lambda k: float(factorial2(k)) if k > 0 else 1.0
    num = (2 * alpha / np.pi) ** 0.75 * (4 * alpha) ** ((l + m + n) / 2.0)
    den = np.sqrt(df(2 * l - 1) * df(2 * m - 1) * df(2 * n - 1))
    return num / den


def cartesian_components(l: int) -> List[Tuple[int, int, int]]:
    if l == 0:
        return [(0, 0, 0)]
    if l == 1:
        return [(1, 0, 0), (0, 1, 0), (0, 0, 1)]
    if l == 2:
        return [(2, 0, 0), (1, 1, 0), (1, 0, 1), (0, 2, 0), (0, 1, 1), (0, 0, 2)]
    raise NotImplementedError(f"l={l}")


def element_shells(symbol: str, basis: str) -> List[Tuple[int, np.ndarray, np.ndarray]]:
    """Return [(l, exps, coefs)] for one element in the given basis."""
    symbol = symbol.capitalize()
    basis = basis.lower().replace("_", "-")
    if basis == "sto-3g":
        if symbol not in _STO3G_ZETA:
            raise ValueError(f"no STO-3G data for {symbol}")
        zetas = _STO3G_ZETA[symbol]
        shells = [(0, _STO3G_1S_EXP * zetas[0] ** 2, _STO3G_1S_COEF.copy())]
        if len(zetas) > 1:
            z2 = zetas[1] ** 2
            shells.append((0, _STO3G_2SP_EXP * z2, _STO3G_2S_COEF.copy()))
            shells.append((1, _STO3G_2SP_EXP * z2, _STO3G_2P_COEF.copy()))
        if len(zetas) > 2:
            z3 = zetas[2] ** 2
            shells.append((0, _STO3G_3SP_EXP * z3, _STO3G_3S_COEF.copy()))
            shells.append((1, _STO3G_3SP_EXP * z3, _STO3G_3P_COEF.copy()))
        return [(l, np.asarray(e), np.asarray(c)) for l, e, c in shells]
    if basis in ("6-31g", "631g"):
        if symbol not in _631G:
            raise ValueError(f"no 6-31G data for {symbol} (only H, He embedded)")
        return [(l, np.asarray(e), np.asarray(c)) for l, e, c in _631G[symbol]]
    raise ValueError(f"unknown basis {basis!r}")


ANGSTROM_TO_BOHR = 1.0 / 0.52917721092


def build_shells(geometry, basis: str, unit: str = "angstrom") -> Tuple[List[Shell], List[int], np.ndarray]:
    """Build the shell list for a molecule.

    ``geometry``: [(symbol, (x, y, z)), ...] — same layout as the reference's
    molecule table (molecule_factory.py:45-304; coordinates in Angstrom).

    Returns (shells, charges, coords_bohr).
    """
    scale = ANGSTROM_TO_BOHR if unit.startswith("ang") else 1.0
    shells: List[Shell] = []
    charges: List[int] = []
    coords = []
    for ia, (sym, xyz) in enumerate(geometry):
        sym = sym.capitalize()
        center = np.asarray(xyz, dtype=float) * scale
        charges.append(ATOMIC_NUMBER[sym])
        coords.append(center)
        for l, exps, coefs in element_shells(sym, basis):
            # fold primitive norms into coefficients, then normalize the
            # contraction (using the first cartesian component, which for
            # s/p shells normalizes every component identically)
            lmn0 = cartesian_components(l)[0]
            c = coefs * np.array([_norm_prim(a, lmn0) for a in exps])
            # self-overlap of the contracted function
            from .integrals import primitive_overlap_same_center
            s = 0.0
            for i in range(len(exps)):
                for j in range(len(exps)):
                    s += c[i] * c[j] * primitive_overlap_same_center(exps[i], exps[j], lmn0)
            c = c / np.sqrt(s)
            shells.append(Shell(l, center, np.asarray(exps, float), c, ia))
    return shells, charges, np.asarray(coords)


def nbasis(shells: List[Shell]) -> int:
    return sum(len(cartesian_components(sh.l)) for sh in shells)
