"""Pippenger-style variable-base G1 MSM on device.

Replaces arkworks ``VariableBaseMSM::msm_unchecked`` (reference
prover.rs:379-384, the dominant prover cost: ~12n point-scalar products per
proof across 8 MSMs, SURVEY.md §2.3).

TPU formulation — no data-dependent scatter exists on TPU, so classic
bucket accumulation is recast as sort + blocked scan + threshold gather.
Per window w (c-bit digits):

  1. d_i = digit_w(s_i); sort points by d_i descending (argsort+gather);
  2. view the sorted chunk as (rows, seq) and run ONE inclusive
     mixed-add scan along seq (leaves are affine SRS points: madd-2007-bl,
     8M+3S per add instead of the general 11M+5S), emitting local
     prefixes; a tiny recursive scan over the per-row totals gives
     exclusive row offsets;
  3. sum_i d_i P_i = sum_{t=1}^{2^c-1} PS_{cnt(d >= t)} where the global
     prefix PS_k = local[k] + row_offset[row(k)] is materialized ONLY at
     the 2^c-1 threshold positions (one general add each) — the full
     second combine pass of a classic two-level scan is skipped;
  4. balanced fold of the gathered threshold points per window.

  Window results combine by Horner: acc = 2^c acc + W_w (host, tiny).

All windows process as one batched axis, so the graph holds one madd scan
regardless of window count.  Large inputs stream through fixed-size chunks
inside ONE jitted fori_loop (a single device dispatch per MSM — dispatch
latency through the TPU tunnel is ~30 ms, so per-chunk host loops are
ruinous); per-window partial sums add across chunks in the loop carry.

``fast=True`` skips the doubling fallback in the madd (collision of a
partial bucket sum with the next base point); sound for SRS bases (distinct
powers of a random trapdoor), guarded by an error flag the caller asserts.
"""

from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import jax
import jax.numpy as jnp

from ..hostmath.bls12_381 import R
from .limbs import FR_SPEC, FQ_SPEC, ints_to_limbs
from .field_jax import FR, FQ
from .curve_jax import (
    jac_identity, jac_add, jac_madd, jac_madd_packed, select_point,
    points_to_device, jac_to_host, fold_sum_jac, prefix_scan_jac,
    prefix_scan_jac_tree, tree_sum_jac, pack_limbs,
)

SCALAR_BITS = 255
_MSM_REV = "r7"  # traced-graph revision (see _msm_run_jit)
PTS_PER_QUAD = 4       # packed points per 128-lane gather-table row
_GATHER_BLK = 1024     # pallas_gather.BLK (import-free copy; asserted below)


def _fused_tag() -> str:
    from .pallas_scan import FUSED_REV
    return f"-fu{FUSED_REV}"


def _fused_mode() -> bool:
    """Fused gather+madd scan kernel (pallas_scan.py) vs the split
    gather-kernel + lax.scan pipeline.  Default OFF: measured on v5e the
    fused kernel exactly equals the split sum (211.5 vs 92.5 + 117.9 ms
    per 2^18 chunk) — Mosaic serializes the scalar gather against the
    madd vector work whether the gather is a fori_loop or fully unrolled
    straight-line code, so the hoped-for overlap never materializes."""
    import os
    return os.environ.get("POLYMATH_MSM_FUSED", "") in ("1", "on", "true")


def _rowscan_mode() -> str:
    """Row-offset prefix strategy: 'tree' (log-depth Hillis-Steele, fat
    batches — TPU default) or 'seq' (two-level lax.scan — CPU default,
    keeps XLA:CPU compiles linear)."""
    import os
    mode = os.environ.get("POLYMATH_MSM_ROWSCAN", "")
    if mode in ("tree", "seq"):
        return mode
    from ..utils.config import on_tpu
    return "tree" if on_tpu() else "seq"


def _scan_seq(chunk: int | None = None) -> int:
    import os
    env = os.environ.get("POLYMATH_MSM_SEQ")
    if env:
        return int(env)
    # keep rows = chunk/seq at 2048: the scan stays 45k lanes wide
    # (VPU-saturating) and the row-offset tree stays 11 levels
    if chunk is not None and chunk >= (1 << 19):
        return 256
    return 128


def _window_params(n: int):
    """Pick window width c and count for an n-point MSM chunk.

    Total adds per chunk ~ W*(n + 2*2^c) with W = ceil(255/c): larger c
    trades scan adds for threshold/fold adds; c ~ log2(n) - 4 balances
    them.  POLYMATH_MSM_C overrides for tuning."""
    import os
    env = os.environ.get("POLYMATH_MSM_C")
    if env:
        c = int(env)
    elif n <= 32:
        c = 4
    elif n <= 4096:
        c = 8
    else:
        # r5 sweep on TPU v5e at 2^21 points (r7 graph): chunk 2^19
        # c13/seq256 1.348 Mpts/s > c12 1.336; at chunk 2^18 c12 1.228 >
        # c13 1.170 — c = log2(chunk) - 6 tracks both optima
        c = min(14, max(8, int(np.log2(max(n, 2))) - 6))
    windows = (SCALAR_BITS + c - 1) // c
    return c, windows


def _digits(scalars, c: int, windows: int):
    """scalars: (16, N) canonical Fr limbs -> (windows, N) int32 digits."""
    return FR.window_digits(scalars, c, windows)


def _scan_local_madd(px, py, seq: int, fast: bool):
    """Inclusive mixed-add scan within rows of seq sorted leaves.

    px, py: (L/2, W, n) 16-bit-PACKED sorted affine leaves (identity =
    (0,0)); leaves stay packed through HBM/VMEM, the madd kernel unpacks
    at register level.  The emitted local prefixes are ALSO 16-bit packed
    (the pack fuses into the scan's emission copy): the threshold stage
    then element-gathers half the rows and local HBM halves (~2.9 GB ->
    1.45 GB per 2^19 chunk).  Returns (local (3 PACKED coords of
    (L/2, W, n)), totals (3 unpacked of (L, W, rows)), err bool|None)."""
    Lh, W, n = px.shape
    seq = min(seq, n)
    rows = n // seq
    assert rows * seq == n
    pxr = jnp.moveaxis(px.reshape(Lh, W, rows, seq), -1, 0)  # (seq, L/2, W, rows)
    pyr = jnp.moveaxis(py.reshape(Lh, W, rows, seq), -1, 0)

    acc0 = jac_identity((W, rows))
    err0 = jnp.zeros((W, rows), jnp.bool_) if fast else None

    def body(carry, xy):
        acc, err = carry
        nxt, e = jac_madd_packed(acc, xy, fast=fast)
        if fast:
            err = err | e
        return (nxt, err), tuple(pack_limbs(c) for c in nxt)

    (totals, err), local = jax.lax.scan(body, (acc0, err0), (pxr, pyr))
    # local: 3 coords of (seq, L/2, W, rows) -> (L/2, W, n)
    Lq = local[0].shape[1]
    local = tuple(
        jnp.moveaxis(a, 0, -1).reshape(Lq, W, n) for a in local)
    return local, totals, err


def _msm_chunk(xs, ys, scalars, c: int, windows: int, fast: bool = False,
               seq: int | None = None, rowscan: str | None = None,
               table_quads=None, fused: bool = False):
    """One chunk: (L/2, n) 16-bit-packed affine limbs + (16, n) canonical
    scalars -> (jacobian window sums with trailing axis `windows`,
    err bool|None).

    When ``table_quads`` is given (TPU path) it replaces xs/ys: a
    (n/4 + 1, 128) quad-row point table (4 packed 24-u32 xy rows per
    128-lane row, last row the zero sentinel) consumed by the Pallas
    VMEM gather kernel."""
    n = scalars.shape[-1]
    seq = min(seq or _scan_seq(), n)
    digits = _digits(scalars, c, windows)            # (W, n)
    shift = (n - 1).bit_length()
    if c + shift <= 32:
        # ONE u32 sort of (digit << shift | position) replaces
        # argsort + take_along_axis: both the sorted digits and the
        # gather order fall out of the same sorted key vector
        iota = jax.lax.broadcasted_iota(jnp.uint32, (windows, n), 1)
        key = (digits.astype(jnp.uint32) << shift) | iota
        skey = jnp.flip(jnp.sort(key, axis=-1), axis=-1)
        d_sorted = (skey >> shift).astype(jnp.int32)
        order = (skey & jnp.uint32((1 << shift) - 1)).astype(jnp.int32)
    else:
        order = jnp.argsort(-digits, axis=-1)        # descending per window
        d_sorted = jnp.take_along_axis(digits, order, axis=-1)
    live = d_sorted > 0
    # permute points into bucket order: one row-gather in (n, L) packed
    # layout (contiguous 96-byte rows — half the unpacked traffic).  Dead
    # leaves (digit 0) redirect to a zero sentinel row instead of a
    # full-size where() (saves a ~0.5 GB masked copy per chunk): (0, 0)
    # is the affine identity encoding.
    idx = jnp.where(live, order, n)                  # (W, n)
    if table_quads is not None and fused:
        # fully fused gather+madd+emission kernel: the per-row gather
        # work hides under the madd's vector work (pallas_scan.py)
        from .pallas_scan import fused_scan_msm
        assert n % seq == 0, (n, seq)
        local, totals, err = fused_scan_msm(table_quads, idx, seq, fast)
    elif table_quads is not None:
        # VMEM-table Pallas gather emits limb-major (L, W, n) directly
        # (13 ns/row vs the XLA gather's ~23 ns/row + relayout)
        from .pallas_gather import gather_rows_quads
        g = gather_rows_quads(table_quads, idx)          # (L, W, n)
    else:
        Lh = xs.shape[0]                                 # L/2 packed rows
        xy_rows = jnp.concatenate([xs, ys], axis=0).T    # (n, L)
        xy_ext = jnp.concatenate(
            [xy_rows, jnp.zeros((1, 2 * Lh), jnp.uint32)], axis=0)
        g = xy_ext[idx.reshape(-1)]                      # (W*n, L)
        g = jnp.moveaxis(g.reshape(windows, n, 2 * Lh), -1, 0)  # (L, W, n)
    if not (table_quads is not None and fused):
        Lh = g.shape[0] // 2
        pad = (-n) % seq
        if pad:
            # pad with dead identity leaves (digit 0 at the tail keeps
            # the descending order and all threshold counts unchanged)
            g = jnp.concatenate(
                [g, jnp.zeros(g.shape[:-1] + (pad,), jnp.uint32)], axis=-1)
            d_sorted = jnp.concatenate(
                [d_sorted, jnp.zeros((windows, pad), jnp.int32)], axis=-1)
            n += pad
        px, py = g[:Lh], g[Lh:]
        local, totals, err = _scan_local_madd(px, py, seq, fast)
    rows = n // seq
    if rows > 1:
        if (rowscan or _rowscan_mode()) == "tree":
            row_ps = prefix_scan_jac_tree(totals)    # (L, W, rows) inclusive
        else:
            row_ps = prefix_scan_jac(totals)
        idn1 = jac_identity((windows, 1))
        offs = tuple(jnp.concatenate([i1, a[..., :-1]], axis=-1)
                     for i1, a in zip(idn1, row_ps))  # exclusive
    else:
        offs = None

    # per-window counts of digits >= t for t = 1..2^c-1, via binary search
    # in the (flipped, ascending) sorted digit array — TPU bincount lowers
    # to scatter-add, which is far slower than log2(n) search steps.
    # t runs to 2^c inclusive (a dead threshold: no digit reaches it, so
    # cnt = 0 -> identity) purely so the trailing axis is 2^c: at c = 14
    # the 16383-wide layout pays lane-padding relayouts in the threshold
    # add AND an identity-concat copy at every tree_sum halving level.
    asc = jnp.flip(d_sorted, axis=-1)
    t_vals = jnp.arange(1, (1 << c) + 1, dtype=d_sorted.dtype)
    first_ge = jax.vmap(
        lambda a: jnp.searchsorted(a, t_vals, side="left"))(asc)
    cnt = (n - first_ge).astype(jnp.int32)           # (W, 2^c)
    pos = jnp.clip(cnt - 1, 0, n - 1)
    # local is 16-bit packed: gather half the element rows, unpack the
    # (tiny) threshold set afterwards.  The row offsets are packed the
    # same way before their gather — as unpacked jacobians they were 72
    # element-gather rows x W*2^c positions, the largest single cost of
    # the threshold stage.
    from .curve_jax import unpack_limbs
    loc_g = tuple(
        unpack_limbs(jnp.take_along_axis(a, pos[None], axis=-1))
        for a in local)
    if offs is not None:
        off_g = tuple(
            unpack_limbs(jnp.take_along_axis(
                pack_limbs(a), (pos // seq)[None], axis=-1))
            for a in offs)
        ps_g = jac_add(loc_g, off_g)                 # general add at thresholds
    else:
        ps_g = loc_g
    ps_g = select_point(cnt > 0, ps_g,
                        jac_identity((windows, 1 << c)))
    wsum = tree_sum_jac(ps_g)                        # (L, W, 1)
    if fast:
        err = jnp.any(err)
    return tuple(a[..., 0] for a in wsum), err


def _msm_run(xs, ys, sc, chunk: int, n_chunks: int, c: int, windows: int,
             fast: bool, mont: bool, seq: int, rowscan: str,
             pallas_gather: bool, fused: bool = False):
    """Whole MSM inside one trace: fori_loop over fixed-size chunks."""
    if mont:
        sc = FR.from_mont(sc)

    quads = None
    if pallas_gather and n_chunks < 16:
        # one row-major relayout of the used prefix per MSM (a few ms,
        # amortized over all chunks) so each chunk's gather table is a
        # plain quad-row slice — no per-chunk transpose
        lim = n_chunks * chunk
        rows = jnp.concatenate([xs[:, :lim], ys[:, :lim]], axis=0).T
        quads = rows.reshape(lim // PTS_PER_QUAD,
                             PTS_PER_QUAD * rows.shape[-1])

    def one(k):
        sc_k = jax.lax.dynamic_slice_in_dim(sc, k * chunk, chunk, 1)
        if quads is not None:
            q = chunk // PTS_PER_QUAD
            tq = jax.lax.dynamic_slice_in_dim(quads, k * q, q, 0)
            tq = jnp.pad(tq, ((0, 1), (0, 128 - tq.shape[-1])))
            return _msm_chunk(None, None, sc_k, c, windows, fast, seq,
                              rowscan, table_quads=tq, fused=fused)
        if pallas_gather:
            # many-chunk MSMs (the ~10n d-basis) build the quad table
            # per chunk instead: a whole-MSM relayout is a multi-GB HBM
            # resident that OOM'd the 40-chunk class's compile at chunk
            # 2^19; per-chunk it is a ~50 MB transient and ~2 ms
            xs_k = jax.lax.dynamic_slice_in_dim(xs, k * chunk, chunk, 1)
            ys_k = jax.lax.dynamic_slice_in_dim(ys, k * chunk, chunk, 1)
            rows_k = jnp.concatenate([xs_k, ys_k], axis=0).T
            tq = rows_k.reshape(chunk // PTS_PER_QUAD,
                                PTS_PER_QUAD * rows_k.shape[-1])
            tq = jnp.pad(tq, ((0, 1), (0, 128 - tq.shape[-1])))
            return _msm_chunk(None, None, sc_k, c, windows, fast, seq,
                              rowscan, table_quads=tq, fused=fused)
        xs_k = jax.lax.dynamic_slice_in_dim(xs, k * chunk, chunk, 1)
        ys_k = jax.lax.dynamic_slice_in_dim(ys, k * chunk, chunk, 1)
        return _msm_chunk(xs_k, ys_k, sc_k, c, windows, fast, seq, rowscan)

    if n_chunks == 1:
        wsum, err = one(0)
        if not fast:
            err = jnp.zeros((), jnp.bool_)
        return wsum, err

    def body(k, carry):
        acc, err_acc = carry
        part, err = one(k)
        acc = jac_add(acc, part)
        if fast:
            err_acc = err_acc | err
        return (acc, err_acc)

    acc0 = jac_identity((windows,))
    acc, err = jax.lax.fori_loop(
        0, n_chunks, body, (acc0, jnp.zeros((), jnp.bool_)))
    return acc, err


@lru_cache(maxsize=None)
def _msm_run_jit(chunk: int, n_chunks: int, c: int, windows: int,
                 fast: bool, mont: bool, seq: int, rowscan: str,
                 pallas_gather: bool, fused: bool = False):
    # inputs arrive pre-padded to n_chunks*chunk (msm_device), so the
    # program key is exactly (chunk, n_chunks, ...) — the prover's MSM
    # sizes {n, n+1, cols-m0, n-1, 10n+22} collapse to ~3 compiled
    # programs instead of one per exact length
    def run(xs, ys, sc):
        wsum, err = _msm_run(xs, ys, sc, chunk, n_chunks, c, windows,
                             fast, mont, seq, rowscan, pallas_gather,
                             fused)
        return jnp.stack(wsum), err
    from .aot import aot_jit
    # _MSM_REV: bump on any change to the traced MSM graph — the AOT store
    # keys on name+avals, not graph content, and would reuse stale
    # executables otherwise.  Graph variants selected by env/config
    # (rowscan, gather path) are explicit parameters here so they key
    # both this memo and the AOT name (r4 advisor finding).
    return aot_jit(run, f"msm-{_MSM_REV}-{chunk}x{n_chunks}-c{c}w{windows}-"
                        f"{'fast' if fast else 'safe'}-"
                        f"{'mont' if mont else 'canon'}-s{seq}-"
                        f"{rowscan}{'-pg' if pallas_gather else ''}"
                        f"{_fused_tag() if fused else ''}")


def _horner_windows_host(wsums, c: int, windows: int):
    """acc = sum_w 2^(c w) W_w.  Host-side: `windows` points is
    O(windows * c) tiny group ops — not worth a device program (a batch-1
    device graph would dominate compile time).  Runs as a native C++ MSM
    with power-of-two scalars when available (the pure-Python Horner cost
    ~150 ms per MSM — four times per proof)."""
    pts = jac_to_host(wsums)  # list of affine, one per window
    if c * (windows - 1) < 255:
        from ..native import g1_msm
        return g1_msm(pts, [1 << (c * w) for w in range(windows)])
    from ..hostmath import bls12_381 as bls
    acc = None
    for w in range(windows - 1, -1, -1):
        if acc is not None:
            for _ in range(c):
                acc = bls.G1.double(acc)
        acc = bls.G1.add(acc, pts[w])
    return acc


def _default_chunk() -> int:
    """MSM streaming chunk (points per fori_loop step).

    Larger chunks amortize the per-chunk costs that do NOT scale with
    points (sort, threshold gather, window fold, row-offset tree) over
    more points.  r4's XLA row gather degraded with table size (2^19
    LOST, 0.605 vs 0.884 Mpts/s); the r5 Pallas VMEM-table gather does
    not, and 2^19 now wins (1.348 vs 1.228).  2^19 is also the VMEM
    ceiling: the gather table is 64 MB resident."""
    import os
    return int(os.environ.get("POLYMATH_MSM_CHUNK", DEFAULT_CHUNK))


DEFAULT_CHUNK = 1 << 19
MIN_CHUNK = 1 << 6  # CPU floor: small programs compile fast on XLA:CPU
CPU_MAX_CHUNK = 1 << 12


class MsmPending:
    """Deferred MSM result: the device program is dispatched, the host
    combine (error check, window Horner, tail) happens at .result().

    Lets callers queue several independent MSM programs back-to-back so
    the device never idles while the host runs each ~0.1 s combine
    (dispatch through the remote-TPU tunnel is asynchronous; only D2H
    pulls block)."""

    def __init__(self, wsums, err, fast, c, windows, tail_dev, mont):
        self._w = wsums
        self._err = err
        self._fast = fast
        self._c = c
        self._windows = windows
        self._tail_dev = tail_dev
        self._mont = mont

    def result(self):
        if self._fast:
            assert not bool(self._err), (
                "MSM madd collision: repeated base point hit the "
                "fast-mode doubling skip; rerun with fast=False")
        out = _horner_windows_host(tuple(self._w), self._c, self._windows)
        if self._tail_dev is not None:
            tail_pt = _host_tail_rows(np.asarray(self._tail_dev),
                                      self._mont)
            if tail_pt is not None:
                from ..hostmath import bls12_381 as bls
                out = bls.G1.add(out, tail_pt)
        return out


def msm_device(xs, ys, scalars, chunk: int | None = None,
               fast: bool = False, mont: bool = False,
               n_eff: int | None = None, defer: bool = False):
    """MSM over device arrays -> host affine point (or MsmPending with
    defer=True).

    xs, ys: (24, N) affine Montgomery limbs, or (12, N) 16-bit-packed
    (pack_limbs — the form SRS vectors are stored in; unpacked inputs are
    packed here); scalars: (16, M) Fr limbs (canonical, or Montgomery
    with mont=True).  When M < N the remaining bases get zero scalars
    (callers keep the SRS pre-padded on device and pass short per-proof
    scalar vectors — re-padding multi-GB point arrays per call would
    double HBM).

    The whole MSM runs as ONE jitted program per (size, chunk) class: a
    fori_loop streams fixed-size chunks so a handful of compiled programs
    (one scan body each) serve every MSM in the protocol.  fast=True skips
    the madd doubling fallback (see module docstring) and asserts the
    collision flag instead.
    """
    n = xs.shape[-1] if n_eff is None else n_eff
    if n == 0:
        return None  # MSM over the empty set = G1 identity (host convention)
    from .limbs import FQ_SPEC as _FQS
    if xs.shape[0] == _FQS.L:        # unpacked input: pack once (eager)
        xs, ys = pack_limbs(xs), pack_limbs(ys)
    if chunk is None:
        from ..utils.config import on_tpu
        if on_tpu():
            # one chunk size = ONE compiled scan body for every MSM in the
            # protocol (each distinct chunk class is minutes of XLA/Mosaic
            # compile; a mostly-dead trailing chunk costs ~0.2 s of VPU)
            chunk = _default_chunk()
        else:
            # CPU (tests/small circuits): pad less, compile small.  The
            # 2^12 cap keeps every XLA:CPU MSM program under the
            # serialize ceiling (the r4 MiMC d-MSM program at chunk 2^14
            # hit the >2 GB segfault) and collapses the suite's MSM
            # shapes onto a couple of shared classes.
            chunk = min(CPU_MAX_CHUNK,
                        max(MIN_CHUNK, 1 << (n - 1).bit_length()))
    m = min(scalars.shape[-1], n)
    # Tiny-tail split: the protocol's MSM sizes sit a handful of points
    # past an exact chunk multiple (r: n+2, d: 10n+23 with n a power of
    # two) — a full device chunk for <= 64 live points costs ~0.5 s of
    # dead scan.  Peel the tail off to a host Pippenger over a few
    # d2h-pulled rows instead.
    tail_pt = None
    import os as _os
    from ..utils.config import on_tpu as _on_tpu
    _tail_env = _os.environ.get("POLYMATH_MSM_TAIL", "")
    _tail_on = (_on_tpu() if _tail_env == "" else
                _tail_env not in ("0", "off", "false"))
    tail_rows = None
    if _tail_on and m > chunk:
        lo = (m // chunk) * chunk
        t = m - lo
        if 0 < t <= 64:
            tail_rows = (lo, m)
            m = lo
    n_chunks = max(1, (m + chunk - 1) // chunk)
    lim = n_chunks * chunk
    # scalars travel at exactly n_chunks*chunk (zero digits are inert);
    # bases are NEVER sliced — the fori_loop reads a prefix of whatever
    # is stored (pre-padded SRS keeps its full aval, which keys the AOT
    # program class together with the chunk count).  The scalar pad/slice
    # and the tail-row extraction run as ONE jitted program: each eager
    # dispatch through the remote-TPU tunnel costs ~60 ms, and the r/c/d
    # MSMs were paying 3-4 of them per call.
    tail_dev = None
    if tail_rows is not None or scalars.shape[-1] != lim:
        lo_m = tail_rows or (0, 0)
        scalars, tail = _prep_jit(
            lim, lo_m[0], lo_m[1], scalars.shape[-1])(xs, ys, scalars)
        if tail_rows is not None:
            tail_dev = tail
    if xs.shape[-1] < lim:
        z24 = jnp.zeros((xs.shape[0], lim - xs.shape[-1]), jnp.uint32)
        xs = jnp.concatenate([xs, z24], axis=1)
        ys = jnp.concatenate([ys, z24], axis=1)
    c, windows = _window_params(chunk)
    from ..utils.config import use_pallas
    pg = bool(use_pallas()
              and chunk % (PTS_PER_QUAD * _GATHER_BLK) == 0
              and (windows * chunk) % _GATHER_BLK == 0)
    seq_eff = min(_scan_seq(chunk), chunk)
    fused = bool(pg and _fused_mode() and chunk % seq_eff == 0
                 and (chunk // seq_eff) % 8 == 0)
    wsums, err = _msm_run_jit(chunk, n_chunks, c, windows, fast, mont,
                              seq_eff, _rowscan_mode(),
                              pg, fused)(xs, ys, scalars)
    pending = MsmPending(wsums, err, fast, c, windows, tail_dev, mont)
    if defer:
        return pending
    return pending.result()


from functools import lru_cache as _lru


@_lru(maxsize=None)
def _prep_jit(lim: int, lo: int, m: int, src_cols: int):
    """One jitted program for the per-MSM scalar pad/slice + tail-row
    extraction (eager versions cost ~60 ms dispatch EACH via the tunnel)."""
    def run(xs, ys, sc):
        if src_cols < lim:
            sc2 = jnp.concatenate(
                [sc, jnp.zeros((sc.shape[0], lim - src_cols), jnp.uint32)],
                axis=1)
        elif src_cols > lim:
            sc2 = sc[:, :lim]
        else:
            sc2 = sc
        tail = jnp.concatenate(
            [xs[:, lo:m], ys[:, lo:m], sc[:, lo:m]], axis=0)
        return sc2, tail
    return jax.jit(run)


def _host_tail_rows(arr, mont: bool):
    """Host Pippenger over the pulled (12+12+16, t) packed tail rows."""
    import numpy as np
    from .limbs import FQ_SPEC, FR_SPEC, limbs_to_ints
    from ..hostmath import bls12_381 as bls
    from ..hostmath.bls12_381 import Fq

    Lh = FQ_SPEC.L // 2
    txs, tys, tsc = arr[:Lh], arr[Lh:2 * Lh], arr[2 * Lh:]

    def unpack(a):
        out = np.zeros((a.shape[0] * 2, a.shape[1]), np.uint32)
        out[0::2] = a & np.uint32(0xFFFF)
        out[1::2] = a >> np.uint32(16)
        return out

    txs, tys = unpack(txs), unpack(tys)
    pts = []
    for x, y in zip(limbs_to_ints(txs), limbs_to_ints(tys)):
        xv, yv = FQ_SPEC.from_mont_int(x), FQ_SPEC.from_mont_int(y)
        pts.append(None if yv == 0 else (Fq(xv), Fq(yv)))
    sc = limbs_to_ints(tsc)
    if mont:
        sc = [FR_SPEC.from_mont_int(v) for v in sc]
    live_p = [p for p, s in zip(pts, sc) if p is not None and s]
    live_s = [s for p, s in zip(pts, sc) if p is not None and s]
    if not live_p:
        return None
    from ..native import g1_msm
    return g1_msm(live_p, live_s)


DEVICE_MSM_MIN = 256  # below this the host Pippenger wins (no compile)


def msm_host_points(points, scalars_int, chunk: int | None = None):
    """Convenience: host affine points + int scalars -> host affine result."""
    if not points or not scalars_int:
        return None
    n = min(len(points), len(scalars_int))
    if n < DEVICE_MSM_MIN:
        from ..hostmath import bls12_381 as bls
        return bls.G1.msm(points[:n], [s % R for s in scalars_int[:n]])
    xs, ys = points_to_device(points[:n])
    sc = jnp.asarray(ints_to_limbs([s % R for s in scalars_int[:n]], FR_SPEC.L))
    return msm_device(xs, ys, sc, chunk)
