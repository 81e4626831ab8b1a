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

# Universal zeta=1 expansions for the 3d and 4sp shells (least-squares
# max-overlap 3-Gaussian fits of the radial Slater functions R_32 /
# R_4{0,1}, the same construction as the published 1s/2sp/3sp rows above;
# REGENERATED with chem/fit_sto3g.py since the Basis Set Exchange is
# unreachable offline — the same fit reproduces the published 1s/2sp/3sp
# rows to ~1e-6, which pins the procedure
# (tests/test_chem_dshell.py::test_fit_reproduces_published_rows).
_STO3G_3D_EXP = np.array([0.52291114, 0.16395956, 0.06386630])
_STO3G_3D_COEF = np.array([0.16865965, 0.58479851, 0.40567787])

_STO3G_4SP_EXP = np.array([0.24645608, 0.09095846, 0.04016817])
_STO3G_4S_COEF = np.array([-0.30884798, 0.01961530, 1.13102960])
_STO3G_4P_COEF = np.array([-0.12154783, 0.57152644, 0.54989242])

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
    # Si: published molecular STO-3G factors (Hehre-Ditchfield-Stewart-
    # Pople second-row tables).  Self-consistency pin: the three zetas
    # reproduce the canonical table exponents through the universal rows
    # above exactly — 0.4828540806 * 1.75^2 = 1.4787406..., the published
    # Si 3sp leading exponent — the same identity that validates the S/Cl
    # rows below (0.4828540806 * 2.05^2 = 2.0291942..., BSE S row).
    "Si": (13.53, 4.83, 1.75),
    "S": (15.47, 5.79, 2.05),
    "Cl": (16.43, 6.26, 2.10),
}

# Third-row / transition-metal zetas: the published molecular scale
# factors are unrecoverable offline, so these are BEST-ATOM exponents —
# atomic ROHF ground-term energy minimized over the shell zetas with this
# package's own integrals/SCF (chem/fit_sto3g.py optimize_zetas), the
# construction underlying the atomic part of the published tables.
# Provenance and the resulting atomic energies are pinned in
# tests/test_chem_dshell.py; PARITY.md documents the delta vs the
# (unavailable) published molecular factors.
_STO3G_ZETA_BEST_ATOM: Dict[str, Dict[str, float]] = {
    # filled by `python -m openvqe_tpu.chem.fit_sto3g <El> <z0...>` runs
    # (values below are those runs' outputs, committed as data)
    "Si": {"1s": 13.6521, "2sp": 4.8534, "3sp": 1.5308},
    "Fe": {"1s": 25.4925, "2sp": 10.6903, "3sp": 4.2811, "3d": 3.2550,
           "4sp": 1.1889},
}


def _sto3g_shell_plan(symbol: str, prefer_published: bool = True):
    """[(l, universal_exps, universal_coefs, zeta_slot)] for one element —
    the zeta-independent STO-3G structure.  zeta_slot indexes the zeta
    vector handed to fit_sto3g.atomic_energy.

    Published molecular scale factors (_STO3G_ZETA) take precedence over
    the best-atom fits when both exist (Si); pass
    ``prefer_published=False`` to force the best-atom structure (the
    zeta-fit regression tests and convention-toggle measurements)."""
    symbol = symbol.capitalize()
    if symbol in _STO3G_ZETA and prefer_published:
        pass  # fall through to the published-table plan below
    elif symbol in _STO3G_ZETA_BEST_ATOM:
        keys = list(_STO3G_ZETA_BEST_ATOM[symbol])
        plan = [(0, _STO3G_1S_EXP, _STO3G_1S_COEF, keys.index("1s")),
                (0, _STO3G_2SP_EXP, _STO3G_2S_COEF, keys.index("2sp")),
                (1, _STO3G_2SP_EXP, _STO3G_2P_COEF, keys.index("2sp")),
                (0, _STO3G_3SP_EXP, _STO3G_3S_COEF, keys.index("3sp")),
                (1, _STO3G_3SP_EXP, _STO3G_3P_COEF, keys.index("3sp"))]
        if "3d" in keys:
            plan.append((2, _STO3G_3D_EXP, _STO3G_3D_COEF,
                         keys.index("3d")))
        if "4sp" in keys:
            plan.append((0, _STO3G_4SP_EXP, _STO3G_4S_COEF,
                         keys.index("4sp")))
            plan.append((1, _STO3G_4SP_EXP, _STO3G_4P_COEF,
                         keys.index("4sp")))
        return plan
    zetas = _STO3G_ZETA[symbol]
    plan = [(0, _STO3G_1S_EXP, _STO3G_1S_COEF, 0)]
    if len(zetas) > 1:
        plan += [(0, _STO3G_2SP_EXP, _STO3G_2S_COEF, 1),
                 (1, _STO3G_2SP_EXP, _STO3G_2P_COEF, 1)]
    if len(zetas) > 2:
        plan += [(0, _STO3G_3SP_EXP, _STO3G_3S_COEF, 2),
                 (1, _STO3G_3SP_EXP, _STO3G_3P_COEF, 2)]
    return plan

ATOMIC_NUMBER: Dict[str, int] = {
    "H": 1, "He": 2, "Li": 3, "Be": 4, "B": 5, "C": 6, "N": 7, "O": 8,
    "F": 9, "Ne": 10, "Na": 11, "Mg": 12, "Al": 13, "Si": 14, "P": 15,
    "S": 16, "Cl": 17, "Ar": 18, "K": 19, "Ca": 20, "Sc": 21, "Ti": 22,
    "V": 23, "Cr": 24, "Mn": 25, "Fe": 26, "Co": 27, "Ni": 28, "Cu": 29,
    "Zn": 30,
}

_631G: Dict[str, List[Tuple[int, List[float], List[float]]]] = {
    # (angular momentum, exponents, contraction coefficients)
    # H/He from the Basis Set Exchange tables; Li-F from the published
    # Hehre-Ditchfield-Pople 6-31G tables (validated offline against
    # ground-term atomic ROHF windows bracketed by the Hartree-Fock limits
    # and variational ordering vs STO-3G — tests/test_chem_631g.py; exact
    # pyscf oracles are unreachable in this image, documented in PARITY.md)
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
    "Li": [
        (0, [642.41892, 96.798515, 22.091121, 6.2010703, 1.9351177,
             0.6367358],
            [0.0021426, 0.0162089, 0.0773156, 0.2457860, 0.4701890,
             0.3454708]),
        (0, [2.3249184, 0.6324306, 0.0790534],
            [-0.0350917, -0.1912328, 1.0839878]),
        (1, [2.3249184, 0.6324306, 0.0790534],
            [0.0089415, 0.1410095, 0.9453637]),
        (0, [0.0359620], [1.0]),
        (1, [0.0359620], [1.0]),
    ],
    "Be": [
        (0, [1264.5857, 189.93681, 43.159089, 12.098663, 3.8063232,
             1.2728903],
            [0.0019448, 0.0148351, 0.0720906, 0.2371542, 0.4691987,
             0.3565202]),
        (0, [3.1964631, 0.7478133, 0.2199663],
            [-0.1126487, -0.2295064, 1.1869167]),
        (1, [3.1964631, 0.7478133, 0.2199663],
            [0.0559802, 0.2615506, 0.7939723]),
        (0, [0.0823099], [1.0]),
        (1, [0.0823099], [1.0]),
    ],
    "B": [
        (0, [2068.8823, 310.64957, 70.683033, 19.861080, 6.2993048,
             2.1270270],
            [0.0018663, 0.0142515, 0.0695516, 0.2325729, 0.4670787,
             0.3634314]),
        (0, [4.7279710, 1.1903377, 0.3594117],
            [-0.1303938, -0.1307889, 1.1309444]),
        (1, [4.7279710, 1.1903377, 0.3594117],
            [0.0745976, 0.3078467, 0.7434568]),
        (0, [0.1267512], [1.0]),
        (1, [0.1267512], [1.0]),
    ],
    "C": [
        (0, [3047.5249, 457.36951, 103.94869, 29.210155, 9.2866630,
             3.1639270],
            [0.0018347, 0.0140373, 0.0688426, 0.2321844, 0.4679413,
             0.3623120]),
        (0, [7.8682724, 1.8812885, 0.5442493],
            [-0.1193324, -0.1608542, 1.1434564]),
        (1, [7.8682724, 1.8812885, 0.5442493],
            [0.0689991, 0.3164240, 0.7443083]),
        (0, [0.1687144], [1.0]),
        (1, [0.1687144], [1.0]),
    ],
    "N": [
        (0, [4173.5110, 627.45790, 142.90210, 40.234330, 12.820210,
             4.3904370],
            [0.0018348, 0.0139950, 0.0685870, 0.2322410, 0.4690700,
             0.3604550]),
        (0, [11.626358, 2.7162800, 0.7722180],
            [-0.1149610, -0.1691180, 1.1458520]),
        (1, [11.626358, 2.7162800, 0.7722180],
            [0.0675800, 0.3239070, 0.7408950]),
        (0, [0.2120313], [1.0]),
        (1, [0.2120313], [1.0]),
    ],
    "O": [
        (0, [5484.6717, 825.23495, 188.04696, 52.964500, 16.897570,
             5.7996353],
            [0.0018311, 0.0139501, 0.0684451, 0.2327143, 0.4701930,
             0.3585209]),
        (0, [15.539616, 3.5999336, 1.0137618],
            [-0.1107775, -0.1480263, 1.1307670]),
        (1, [15.539616, 3.5999336, 1.0137618],
            [0.0708743, 0.3397528, 0.7271586]),
        (0, [0.2700058], [1.0]),
        (1, [0.2700058], [1.0]),
    ],
    "F": [
        (0, [7001.7131, 1051.3660, 239.28569, 67.397445, 21.519957,
             7.4031013],
            [0.0018196169, 0.0139160796, 0.0684053245, 0.2331857600,
             0.4712674390, 0.3566185460]),
        (0, [20.847952, 4.8083083, 1.3440699],
            [-0.1085069750, -0.1464516580, 1.1286885800]),
        (1, [20.847952, 4.8083083, 1.3440699],
            [0.0716287243, 0.3459121030, 0.7224699570]),
        (0, [0.3581514], [1.0]),
        (1, [0.3581514], [1.0]),
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


def element_shells(symbol: str, basis: str,
                   prefer_published: bool = True) -> List[Tuple[int, np.ndarray, np.ndarray]]:
    """Return [(l, exps, coefs)] for one element in the given basis."""
    symbol = symbol.capitalize()
    basis = basis.lower().replace("_", "-")
    if basis == "sto-3g":
        # published molecular scale factors first (they match the
        # reference's pyscf/BSE chain); best-atom fits only where no
        # published factors are recoverable (Fe)
        if symbol in _STO3G_ZETA and (prefer_published
                                      or symbol not in _STO3G_ZETA_BEST_ATOM):
            zv = list(_STO3G_ZETA[symbol])
        elif symbol in _STO3G_ZETA_BEST_ATOM:
            zv = list(_STO3G_ZETA_BEST_ATOM[symbol].values())
        else:
            raise ValueError(f"no STO-3G data for {symbol}")
        return [(l, np.asarray(exps) * zv[slot] ** 2, np.asarray(coefs))
                for l, exps, coefs, slot in _sto3g_shell_plan(
                    symbol, prefer_published=prefer_published)]
    if basis in ("6-31g", "631g"):
        if symbol not in _631G:
            raise ValueError(f"no 6-31G data for {symbol}")
        return [(l, np.asarray(e), np.asarray(c)) for l, e, c in _631G[symbol]]
    raise ValueError(f"unknown basis {basis!r}")


ANGSTROM_TO_BOHR = 1.0 / 0.52917721092


def _contracted_shell(l: int, exps, coefs, center, ia: int) -> Shell:
    """Fold primitive norms into coefficients and normalize the contraction
    to the FIRST cartesian component.  For d shells the other components
    then have non-unit self-overlap (xy vs xx) — harmless: the SCF solves
    the generalized eigenproblem in S, and the HF energy is invariant to
    per-function rescaling."""
    lmn0 = cartesian_components(l)[0]
    c = np.asarray(coefs) * np.array([_norm_prim(a, lmn0) for a in exps])
    from .integrals import primitive_overlap_same_center
    s = 0.0
    for i in range(len(exps)):
        for j in range(len(exps)):
            s += c[i] * c[j] * primitive_overlap_same_center(
                exps[i], exps[j], lmn0)
    return Shell(l, center, np.asarray(exps, float), c / np.sqrt(s), ia)


def build_shells(geometry, basis: str, unit: str = "angstrom",
                 prefer_published: bool = True) -> Tuple[List[Shell], List[int], np.ndarray]:
    """Build the shell list for a molecule.

    ``geometry``: [(symbol, (x, y, z)), ...] — same layout as the reference's
    molecule table (molecule_factory.py:45-304; coordinates in Angstrom).
    ``prefer_published=False`` forces the best-atom STO-3G zetas where both
    tables exist (Si) — the Li2FeSiO4 chain needs it (li2fesio4.py).

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
        for l, exps, coefs in element_shells(
                sym, basis, prefer_published=prefer_published):
            shells.append(_contracted_shell(l, exps, coefs, center, ia))
    return shells, charges, np.asarray(coords)


def build_shells_from_defs(geometry, defs: Dict[str, List[Tuple]],
                           unit: str = "angstrom"):
    """build_shells with explicit per-element [(l, exps, coefs)] shell
    definitions (zeta optimization, custom bases)."""
    scale = ANGSTROM_TO_BOHR if unit.startswith("ang") else 1.0
    shells: List[Shell] = []
    charges: List[int] = []
    coords = []
    for ia, (sym, xyz) in enumerate(geometry):
        sym = sym.capitalize()
        center = np.asarray(xyz, dtype=float) * scale
        charges.append(ATOMIC_NUMBER[sym])
        coords.append(center)
        for l, exps, coefs in defs[sym]:
            shells.append(_contracted_shell(l, exps, coefs, center, ia))
    return shells, charges, np.asarray(coords)


def nbasis(shells: List[Shell]) -> int:
    return sum(len(cartesian_components(sh.l)) for sh in shells)


# Cartesian -> real-spherical (pure) d projection ---------------------------
#
# The reference's pyscf chain runs with SPHERICAL d functions (5 per d
# shell); this stack computes integrals over CARTESIAN shells (6 per d
# shell, the extra function being the s-contaminant xx+yy+zz).  Because
# every cartesian component of one contracted shell shares the SAME radial
# contraction (build order in _contracted_shell/cartesian_components), the
# pure-d combinations transfer directly as monomial combinations of the
# shell's component functions; the scales below make each spherical
# function unit-normalized given this package's component normalization
# (first component xx has unit norm, so <xy|xy> = 1/3 and <xx|yy> = 1/3
# exactly — the Gaussian moment ratio is exponent-independent, hence exact
# for contractions too; verified numerically via B^T S B in
# tests/test_chem_dshell.py).
#
# Rows: cartesian order from cartesian_components(2) = xx, xy, xz, yy,
# yz, zz.  Columns: real spherical harmonics in the standard m = -2..2
# order (pyscf's): xy, yz, z^2, xz, x^2-y^2.
_SQRT3 = float(np.sqrt(3.0))
_CART2SPH_D = np.array([
    #   xy      yz     z^2     xz     x^2-y^2
    [0.0,     0.0,   -0.5,    0.0,   _SQRT3 / 2],   # xx
    [_SQRT3,  0.0,    0.0,    0.0,   0.0],          # xy
    [0.0,     0.0,    0.0,    _SQRT3, 0.0],         # xz
    [0.0,     0.0,   -0.5,    0.0,  -_SQRT3 / 2],   # yy
    [0.0,     _SQRT3, 0.0,    0.0,   0.0],          # yz
    [0.0,     0.0,    1.0,    0.0,   0.0],          # zz
])


def cart2sph_matrix(shells: List[Shell]) -> np.ndarray:
    """Block-diagonal (n_cartesian x n_spherical) basis transformation.

    Identity blocks for s/p shells; the 6x5 pure-d projection for each d
    shell.  Applying it to the cartesian integrals (S' = B^T S B, and all
    four ERI axes) reproduces the integrals a spherical-harmonic code
    (pyscf default, the reference's contextual_subspace.ipynb chain) would
    compute, dropping the s-contaminant from every d shell."""
    blocks = []
    for sh in shells:
        if sh.l < 2:
            blocks.append(np.eye(len(cartesian_components(sh.l))))
        elif sh.l == 2:
            blocks.append(_CART2SPH_D)
        else:
            raise NotImplementedError(f"l={sh.l}")
    ncart = sum(b.shape[0] for b in blocks)
    nsph = sum(b.shape[1] for b in blocks)
    B = np.zeros((ncart, nsph))
    r = c = 0
    for b in blocks:
        B[r:r + b.shape[0], c:c + b.shape[1]] = b
        r += b.shape[0]
        c += b.shape[1]
    return B


def to_spherical(B: np.ndarray, S: np.ndarray, hmats: List[np.ndarray],
                 eri: np.ndarray):
    """Transform overlap, one-electron matrices, and the 4-index ERI from
    the cartesian to the spherical basis.  Returns (S', [h'...], eri')."""
    S2 = B.T @ S @ B
    h2 = [B.T @ h @ B for h in hmats]
    for _ in range(4):
        # contract axis 0 with B and push the result to the last axis:
        # four applications transform every index and restore the order
        eri = np.tensordot(eri, B, axes=([0], [0]))
    return S2, h2, eri
