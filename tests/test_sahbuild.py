"""Binned-SAH cluster builder: numpy vs native C++ parity.

The native builder (hala_tpu/native/meshopt.cpp hala_sah_slots) must
reproduce the numpy reference split-for-split — same bin rule, same
double-accumulated SAH cost, same DFS near-child-first emission — so
the device layout (and therefore golden renders) is independent of
which builder ran.
"""

import numpy as np
import pytest


def _boxes(n, seed):
    rs = np.random.RandomState(seed)
    ctr = rs.uniform(-10, 10, (n, 3)).astype(np.float32)
    ext = rs.uniform(0.01, 0.5, (n, 3)).astype(np.float32)
    return ctr - ext, ctr + ext


@pytest.mark.parametrize("n", [500, 5000, 40000])
def test_native_matches_numpy(n):
    from hala_tpu.native import sah_leaves_native
    from hala_tpu.ops.sahbuild import sah_leaves

    lo, hi = _boxes(n, seed=n)
    native = sah_leaves_native(lo, hi, 128, 16)
    if native is None:
        pytest.skip("native toolchain unavailable")
    order, sizes = native
    leaves = sah_leaves(lo, hi, 128)
    np.testing.assert_array_equal(sizes, [len(l) for l in leaves])
    np.testing.assert_array_equal(order, np.concatenate(leaves))


def test_slot_map_contract():
    from hala_tpu.ops.sahbuild import sah_slot_map

    lo, hi = _boxes(3000, seed=1)
    slots = sah_slot_map(lo, hi, 128)
    assert slots.shape[0] % 128 == 0
    real = slots[slots >= 0]
    # every triangle appears exactly once
    np.testing.assert_array_equal(np.sort(real), np.arange(3000))
    # each 128-block is one leaf: real slots before pads within a block
    blocks = slots.reshape(-1, 128)
    for b in blocks:
        k = (b >= 0).sum()
        assert (b[:k] >= 0).all() and (b[k:] == -1).all()
