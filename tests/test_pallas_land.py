"""Landing-kernel (ops/pallas_land) tests.

The kernel itself only lowers on real TPU hardware (its while-loop +
dynamic-slice structure stalls the interpret-mode CPU compile), so the
CPU suite pins the FALLBACK contract — land_max impl='pallas'/'auto'
must silently produce the segmax result off-TPU — and the TPU oracle
test auto-skips here. On-chip verification runs via
tools/pallas_land_check.py (numpy oracle over edge cases) and
tools/ab_insert_land.py (bit-identical sketch state in the full
insert, 'equal_state' lines in docs/r5_measurements/ab_insert_land.txt).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cafe_tpu.ops.sorted_update import land_max


def _case(rng, b, c, n):
    keys = np.sort(rng.integers(0, n + 7, b)).astype(np.int32)
    enc = np.where(rng.random((b, c)) < 0.6,
                   rng.integers(0, 1 << 30, (b, c)), -1).astype(np.int32)
    want = np.full((n, c), -1, np.int64)
    m = keys < n
    if m.any():
        np.maximum.at(want, keys[m], enc[m])
    return keys, enc, want


@pytest.mark.timeout(300)
@pytest.mark.parametrize("impl", ["pallas", "auto"])
def test_land_max_pallas_falls_back_off_tpu(impl):
    if jax.default_backend() == "tpu":
        pytest.skip("fallback contract is the off-TPU behavior")
    rng = np.random.default_rng(0)
    keys, enc, want = _case(rng, 1024, 4, 300)
    got = np.asarray(land_max(jnp.asarray(enc), jnp.asarray(keys), 300,
                              impl))
    np.testing.assert_array_equal(got, want)
    ref = np.asarray(land_max(jnp.asarray(enc), jnp.asarray(keys), 300,
                              "segmax"))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.timeout(600)
def test_land_max_pallas_oracle_on_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("needs real TPU (interpret mode does not lower)")
    from cafe_tpu.ops.pallas_land import pallas_land_max
    rng = np.random.default_rng(1)
    for b, c, n in [(53248, 5, 16896), (53248, 3, 1690), (512, 2, 64),
                    (100, 4, 128)]:
        keys, enc, want = _case(rng, b, c, n)
        got = np.asarray(pallas_land_max(jnp.asarray(enc),
                                         jnp.asarray(keys), n))
        np.testing.assert_array_equal(got, want, err_msg=f"{b},{c},{n}")
