"""Explicit-collective distributed SpMV + CG via shard_map.

Complement to parallel.sharded (GSPMD auto-partitioning): here the
per-device program is written explicitly — each device owns a contiguous
row block of the operator and computes its y block locally; solver dot
products are explicit `psum`s over the ICI mesh axis.  This is the
scaling-book recipe with the collectives placed by hand, and it documents
exactly what rides the interconnect per iteration: 2 scalar all-reduces and
one x all-gather equivalent (x is kept replicated, updated redundantly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cusp_autotuned_tpu import formats as F
from cusp_autotuned_tpu.utils.exceptions import NotImplementedException
from cusp_autotuned_tpu.utils.padding import round_up


def _dia_local_blocks(A: F.DIA, n_dev: int):
    """Split the DIA data into per-device row blocks, each padded so its
    shifted x-window reads stay in bounds of the replicated padded x."""
    m, n = A.shape
    offs = A.offsets
    left = -min(0, min(offs))
    mp = round_up(A.rows_padded, n_dev * 128)
    data = np.asarray(A.data)
    if data.shape[1] != mp:
        buf = np.zeros((data.shape[0], mp), data.dtype)
        buf[:, : data.shape[1]] = data
        data = buf
    block = mp // n_dev
    x_len = left + mp + max(0, max(offs)) + 128
    return data, block, left, x_len, mp


def sharded_spmv_dia_shardmap(A: F.DIA, mesh: Mesh, axis: str = "rows"):
    """Returns fn(x) computing y = A @ x with the DIA data row-sharded over
    the mesh and x replicated; each device slices its own shifted windows."""
    n_dev = mesh.devices.size
    m, n = A.shape
    offs = A.offsets
    data, block, left, x_len, mp = _dia_local_blocks(A, n_dev)
    data_sh = jax.device_put(jnp.asarray(data),
                             NamedSharding(mesh, P(None, axis)))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P()), out_specs=P(axis))
    def local_spmv(data_blk, x_pad):
        i = jax.lax.axis_index(axis)
        base = i * block
        acc = None
        for d, off in enumerate(offs):
            seg = jax.lax.dynamic_slice(x_pad, (base + off + left,), (block,))
            term = data_blk[d] * seg
            acc = term if acc is None else acc + term
        return acc

    def fn(x):
        x_pad = jnp.pad(x, (left, x_len - left - n))
        return local_spmv(data_sh, x_pad)[:m]

    return fn


def distributed_cg_shardmap(A: F.DIA, b, mesh: Mesh, iterations: int = 25,
                            axis: str = "rows"):
    """CG with the SpMV sharded via shard_map and every reduction an
    explicit psum.  Returns (x, final residual norm)."""
    if not isinstance(A, F.DIA):
        raise NotImplementedException("shard_map CG currently takes DIA")
    n_dev = mesh.devices.size
    m, n = A.shape
    offs = A.offsets
    data, block, left, x_len, mp = _dia_local_blocks(A, n_dev)
    data_sh = jax.device_put(jnp.asarray(data),
                             NamedSharding(mesh, P(None, axis)))
    b_pad = jnp.pad(jnp.asarray(b), (0, mp - m))

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(axis)), out_specs=(P(axis), P()))
    def solve(data_blk, b_blk):
        i = jax.lax.axis_index(axis)
        base = i * block

        def spmv_local(x_pad):
            acc = None
            for d, off in enumerate(offs):
                seg = jax.lax.dynamic_slice(x_pad, (base + off + left,),
                                            (block,))
                term = data_blk[d] * seg
                acc = term if acc is None else acc + term
            return acc

        def pdot(u_blk, v_blk):
            return jax.lax.psum(jnp.vdot(u_blk, v_blk), axis)

        def to_replicated(v_blk):
            # gather the row blocks into the replicated padded-x layout
            full = jax.lax.all_gather(v_blk, axis, tiled=True)
            return jnp.pad(full, (left, x_len - left - full.shape[0]))

        def body(_, carry):
            x_blk, r_blk, p_blk, rz = carry
            y_blk = spmv_local(to_replicated(p_blk))
            alpha = rz / pdot(p_blk, y_blk)
            x_blk = x_blk + alpha * p_blk
            r_blk = r_blk - alpha * y_blk
            rz_new = pdot(r_blk, r_blk)
            p_blk = r_blk + (rz_new / rz) * p_blk
            return (x_blk, r_blk, p_blk, rz_new)

        x0 = jnp.zeros_like(b_blk)
        carry = (x0, b_blk, b_blk, pdot(b_blk, b_blk))
        x_blk, r_blk, p_blk, rz = jax.lax.fori_loop(0, iterations, body, carry)
        return x_blk, jnp.sqrt(jnp.real(rz))

    with mesh:
        x_pad, r_norm = jax.jit(solve)(data_sh, b_pad)
    return x_pad[:m], r_norm


def distributed_cg_halo(A: F.DIA, b, mesh: Mesh, iterations: int = 25,
                        axis: str = "rows"):
    """CG with HALO-EXCHANGE communication: each device holds a contiguous
    row block of the banded DIA operator, and per iteration exchanges only
    the halo edges (two `ppermute`s of max-offset-width slices) instead of
    all-gathering the full vector — the per-iteration ICI traffic drops from
    O(n) to O(bandwidth).  Returns (x, final residual norm)."""
    if not isinstance(A, F.DIA):
        raise NotImplementedException("halo CG currently takes DIA")
    n_dev = mesh.devices.size
    m, n = A.shape
    offs = A.offsets
    left = -min(0, min(offs))
    right = max(0, max(offs))
    data, block, _, _, mp = _dia_local_blocks(A, n_dev)
    if left > block or right > block:
        raise NotImplementedException(
            "diagonal span exceeds the per-device block; use the "
            "all-gather path")
    # halo widths padded to a lane multiple so slices stay aligned
    hl = max(round_up(left, 128), 128)
    hr = max(round_up(right, 128), 128)
    if hl > block or hr > block:
        raise NotImplementedException(
            "halo wider than the per-device block; use the all-gather path")
    data_sh = jax.device_put(jnp.asarray(data),
                             NamedSharding(mesh, P(None, axis)))
    b_pad = jnp.pad(jnp.asarray(b), (0, mp - m))

    fwd = [(i, i + 1) for i in range(n_dev - 1)]      # halo to the right
    bwd = [(i + 1, i) for i in range(n_dev - 1)]      # halo to the left

    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(axis)), out_specs=(P(axis), P()))
    def solve(data_blk, b_blk):
        def spmv_local(v_blk):
            # my left halo = tail of the PREVIOUS device's block
            lh = jax.lax.ppermute(v_blk[-hl:], axis, fwd)
            rh = jax.lax.ppermute(v_blk[:hr], axis, bwd)
            x_ext = jnp.concatenate([lh, v_blk, rh])
            acc = None
            for d, off in enumerate(offs):
                seg = jax.lax.dynamic_slice(x_ext, (hl + off,), (block,))
                term = data_blk[d] * seg
                acc = term if acc is None else acc + term
            return acc

        def pdot(u_blk, v_blk):
            return jax.lax.psum(jnp.vdot(u_blk, v_blk), axis)

        def body(_, carry):
            x_blk, r_blk, p_blk, rz = carry
            y_blk = spmv_local(p_blk)
            alpha = rz / pdot(p_blk, y_blk)
            x_blk = x_blk + alpha * p_blk
            r_blk = r_blk - alpha * y_blk
            rz_new = pdot(r_blk, r_blk)
            p_blk = r_blk + (rz_new / rz) * p_blk
            return (x_blk, r_blk, p_blk, rz_new)

        x0 = jnp.zeros_like(b_blk)
        carry = (x0, b_blk, b_blk, pdot(b_blk, b_blk))
        x_blk, r_blk, p_blk, rz = jax.lax.fori_loop(0, iterations, body,
                                                    carry)
        return x_blk, jnp.sqrt(jnp.real(rz))

    with mesh:
        x_pad, r_norm = jax.jit(solve)(data_sh, b_pad)
    return x_pad[:m], r_norm
