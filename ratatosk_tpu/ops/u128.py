"""Traced-shift 128-bit (two-word uint64) helpers for device k-mer surgery.

correct/seeds.py does 1-edit window surgery with PYTHON-int shift amounts
(static per call). The device probe kernel (ops/plan_device.py) scans over the
edit position with `lax.scan`, so the shift amounts are TRACED scalars; these
helpers implement the same 128-bit ops with jnp.where dispatch on s >= 64 and
explicit zero-fill for out-of-range shifts (XLA shift semantics are undefined
at >= bit width).

Values are (hi, lo) uint64 pairs = hi * 2^64 + lo; all shift amounts s are
scalar int32/int64 traced values in [0, 128].
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_FULL = np.uint64(0xFFFFFFFFFFFFFFFF)
_U0 = np.uint64(0)


def _u(s):
    return jnp.asarray(s).astype(jnp.uint64)


def shr64(x, s):
    """x >> s with 0 when s >= 64 (s scalar traced, [0, 128])."""
    s = _u(s)
    return jnp.where(s >= 64, _U0, x >> jnp.minimum(s, np.uint64(63)))


def shl64(x, s):
    s = _u(s)
    return jnp.where(s >= 64, _U0, x << jnp.minimum(s, np.uint64(63)))


def shr128(hi, lo, s):
    """(hi, lo) >> s."""
    s = _u(s)
    big = s >= 64
    # s == 0: shl64(hi, 64) == 0, so the small branch reduces to lo. correct.
    lo_small = shr64(lo, s) | shl64(hi, np.uint64(64) - jnp.minimum(s, np.uint64(64)))
    s_big = jnp.where(big, s - np.uint64(64), _U0)
    lo_new = jnp.where(big, shr64(hi, s_big), lo_small)
    hi_new = jnp.where(big, _U0, shr64(hi, s))
    return hi_new, lo_new


def shl128(hi, lo, s):
    """(hi, lo) << s (result truncated to 128 bits)."""
    s = _u(s)
    big = s >= 64
    hi_small = shl64(hi, s) | shr64(lo, np.uint64(64) - jnp.minimum(s, np.uint64(64)))
    s_big = jnp.where(big, s - np.uint64(64), _U0)
    hi_new = jnp.where(big, shl64(lo, s_big), hi_small)
    lo_new = jnp.where(big, _U0, shl64(lo, s))
    return hi_new, lo_new


def mask128(n):
    """Low-n-bits mask as (hi, lo); n scalar traced in [0, 128]."""
    n = _u(n)
    lo = jnp.where(n >= 64, _FULL,
                   shl64(jnp.uint64(1), n) - np.uint64(1))
    hi = jnp.where(n <= 64, _U0,
                   shl64(jnp.uint64(1), n - np.uint64(64)) - np.uint64(1))
    return hi, lo


def set_base(hi, lo, m, p, b):
    """Base p (leftmost = 0) of m-base windows set to b.

    hi/lo: uint64 [Q]; m static int; p scalar traced; b static int or traced.
    """
    s = 2 * (m - 1) - 2 * _u(p).astype(jnp.int64)
    s = _u(s)
    mh, ml = shl128(_U0, jnp.uint64(3), s)
    bh, bl = shl128(_U0, _u(b), s)
    return (hi & ~mh) | bh, (lo & ~ml) | bl


def get_base(hi, lo, m, p):
    s = 2 * (m - 1) - 2 * _u(p).astype(jnp.int64)
    _, l = shr128(hi, lo, _u(s))
    return l & np.uint64(3)


def drop_base(hi, lo, m, p):
    """Drop base p of m-base windows -> (m-1)-base windows."""
    p = _u(p).astype(jnp.int64)
    uh, ul = shr128(hi, lo, _u(2 * m - 2 * p))
    mh, ml = mask128(_u(2 * (m - 1) - 2 * p))
    sh, sl = shl128(uh, ul, _u(2 * (m - 1) - 2 * p))
    return sh | (hi & mh), sl | (lo & ml)


def insert_base(hi, lo, m, p, b):
    """Insert base b before index p of m-base windows -> (m+1)-base windows."""
    p = _u(p).astype(jnp.int64)
    uh, ul = shr128(hi, lo, _u(2 * m - 2 * p))
    mh, ml = mask128(_u(2 * m - 2 * p))
    sh, sl = shl128(uh, ul, _u(2 * m - 2 * p + 2))
    bh, bl = shl128(_U0, _u(b), _u(2 * m - 2 * p))
    return sh | bh | (hi & mh), sl | bl | (lo & ml)
