"""Pallas TPU kernel: screened first quarter-transform of DF factors.

TPU-native analog of the reference's only compiled kernel, the OpenMP
``contract_with_TA_1st`` screened transform
(_cpp/eri_sparse_DF.cpp:484): computes Bi[P, mu, i] = sum_nu B[P, mu, nu]
TA[nu, i] while SKIPPING contraction blocks of nu whose AOs cannot reach
any fragment orbital (the S_abs reachability screen of
:mod:`ops.screening` -- block-sparsity by zero-block skipping, the
SURVEY 7.6c design).  The contraction runs on the MXU from VMEM tiles;
skipped blocks cost one predicated branch instead of a matmul.

f32 kernel: the screened path is the large-system pre-screening tier;
the final f64 fragment ERIs always come from the dense path.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NU_BLOCK = 16


def _kernel(mask_ref, Bt_ref, TA_ref, out_ref):
    """One row tile: out[TP_ROWS, nemb] = sum over kept nu-blocks.

    Bt holds the transform operand transposed ([nu, rows]) so the
    nu-block dynamic slice runs along the SUBLANE dimension (16 is a
    multiple of the f32 sublane tile; lane-dim slices would need 128
    alignment).
    """
    nblk = mask_ref.shape[1]
    acc = jnp.zeros(out_ref.shape, jnp.float32)

    def body(k, acc):
        start = k * jnp.int32(NU_BLOCK)
        blk = Bt_ref[pl.ds(start, NU_BLOCK), :]  # [NU, TP_ROWS]
        ta = TA_ref[pl.ds(start, NU_BLOCK), :]   # [NU, nemb]
        contrib = jax.lax.dot_general(
            blk, ta,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [TP_ROWS, nemb]
        return acc + mask_ref[0, k].astype(jnp.float32) * contrib

    acc = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(nblk), body, acc
    )
    out_ref[:] = acc


def screened_first_transform(B, TA, reach, interpret: bool = False):
    """Bi[P, mu, i] = sum_{nu reachable} B[P, mu, nu] TA[nu, i].

    B: [naux, nao, nao] f32; TA: [nao, nemb] f32; reach: [nao] bool AO
    reachability (from ops.screening.ao_reach_per_fragment).  The kernel
    is traced with x64 disabled (Mosaic cannot legalize i64 grid index
    arithmetic).
    """
    B = np.asarray(B, np.float32)
    TA = np.asarray(TA, np.float32)
    naux, nao, _ = B.shape
    nemb = TA.shape[1]
    nblk = -(-nao // NU_BLOCK)
    pad = nblk * NU_BLOCK - nao
    Bp = np.pad(B, ((0, 0), (0, 0), (0, pad))).reshape(
        naux * nao, nblk * NU_BLOCK
    )
    ne = (-(-nemb // 128)) * 128
    TAp = np.pad(TA, ((0, pad), (0, ne - nemb)))
    maskb = np.pad(np.asarray(reach, bool), (0, pad)).reshape(
        nblk, NU_BLOCK
    ).any(axis=1).astype(np.int32)[None, :]

    TP_ROWS = 512  # rows of the flattened [naux*nao] axis per tile
    rows = naux * nao
    nrow_tiles = -(-rows // TP_ROWS)
    row_pad = nrow_tiles * TP_ROWS - rows
    Bt = np.ascontiguousarray(np.pad(Bp, ((0, row_pad), (0, 0))).T)

    call = pl.pallas_call(
        _kernel,
        grid=(nrow_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, nblk), lambda i: (0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (nblk * NU_BLOCK, TP_ROWS),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (nblk * NU_BLOCK, ne),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TP_ROWS, ne), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (nrow_tiles * TP_ROWS, ne), jnp.float32
        ),
        interpret=interpret,
    )
    with jax.enable_x64(False):
        out = jax.jit(call)(maskb, Bt, TAp)
    return np.asarray(out)[:rows, :nemb].reshape(naux, nao, nemb)


def screened_fragment_eri_f32(B, TA, reach, interpret: bool = False):
    """Screened f32 fragment ERI estimate: both quarter transforms with the
    reachability screen, then the Gram product (pre-screening tier)."""
    Bi = screened_first_transform(B, TA, reach, interpret=interpret)
    # second transform is over the already-compressed embedding index
    Bij = jnp.einsum(
        "pmi,mj->pij", Bi, jnp.asarray(TA, jnp.float32)
    )
    naux, nemb, _ = Bij.shape
    Bf = Bij.reshape(naux, nemb * nemb)
    return (Bf.T @ Bf).reshape(nemb, nemb, nemb, nemb)
