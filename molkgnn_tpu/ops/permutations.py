"""Static permutation tables for kernel-support alignment.

Degrees 1-3 enumerate all d! orderings (itertools order, matching the
argmax tie-break behavior of the reference, /root/reference/models/MolKGNN/
kernels.py:109-130). Degree 4 uses only the 12 *even* (rotation) permutations
of the tetrahedron so that mirror-image neighborhoods cannot be aligned away —
this is what preserves chirality (Pattanaik et al. 2020; kernels.py:114-126).

The tables are tiny compile-time constants; applying a permutation is a gather
on axis -2 that XLA folds into the surrounding reshape, so the permuted kernel
tensor [L, P, d, F] is materialized once per forward from the [L, d, F]
parameters.
"""

from itertools import permutations as _perms

import numpy as np

# Even permutations of 4 elements (the rotation group of the tetrahedron),
# same order as the reference list (kernels.py:114-126).
_D4_EVEN = (
    (0, 1, 2, 3),
    (0, 2, 3, 1),
    (0, 3, 1, 2),
    (1, 0, 3, 2),
    (1, 2, 0, 3),
    (1, 3, 2, 0),
    (2, 0, 1, 3),
    (2, 1, 3, 0),
    (2, 3, 0, 1),
    (3, 0, 2, 1),
    (3, 1, 0, 2),
    (3, 2, 1, 0),
)

PERMS = {
    1: tuple(_perms(range(1))),
    2: tuple(_perms(range(2))),
    3: tuple(_perms(range(3))),
    4: _D4_EVEN,
}


def num_perms(deg: int) -> int:
    return len(PERMS[deg])


def perm_table(deg: int) -> np.ndarray:
    """[P, deg] int32 table of permutations for ``deg`` neighbors."""
    return np.asarray(PERMS[deg], dtype=np.int32)
