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


TP_ROWS = 512  # rows of the flattened [naux*nao] axis per tile


class PallasDFFactor:
    """The DF factor prepared ONCE for the screened Pallas transform.

    Per-call host work on the old path — padding + transposing the
    [naux, nao, nao] factor (GBs of numpy copies) and re-uploading it —
    dominated the per-fragment wall on a tunneled chip.  This object
    pays the pad/transpose/upload once and caches the compiled
    ``pallas_call`` per (nemb_padded, interpret), so per-fragment calls
    ship only the (tiny) TA block and mask.
    """

    def __init__(self, B, *, B_dev=None):
        """``B_dev``: an f32 [naux, nao, nao] copy of the factor that is
        ALREADY on the device (e.g. ``SparseDF._B32_dev``).  The
        pad/transpose then runs on-chip — no second multi-GB
        host->device transfer; ``B`` is only consulted for its shape."""
        self.naux, self.nao, _ = np.shape(B)
        self.nblk = -(-self.nao // NU_BLOCK)
        self.pad = self.nblk * NU_BLOCK - self.nao
        self.rows = self.naux * self.nao
        self.nrow_tiles = -(-self.rows // TP_ROWS)
        row_pad = self.nrow_tiles * TP_ROWS - self.rows
        if B_dev is not None:
            Bp = jnp.pad(
                B_dev.astype(jnp.float32),
                ((0, 0), (0, 0), (0, self.pad)),
            ).reshape(self.rows, self.nblk * NU_BLOCK)
            self.Bt_dev = jnp.pad(Bp, ((0, row_pad), (0, 0))).T
        else:
            B = np.asarray(B, np.float32)
            Bp = np.pad(B, ((0, 0), (0, 0), (0, self.pad))).reshape(
                self.rows, self.nblk * NU_BLOCK
            )
            Bt = np.ascontiguousarray(
                np.pad(Bp, ((0, row_pad), (0, 0))).T
            )
            self.Bt_dev = jnp.asarray(Bt)  # uploaded once
        self._calls: dict = {}

    def _call(self, ne: int, interpret: bool):
        key = (ne, interpret)
        if key not in self._calls:
            nblk = self.nblk
            self._calls[key] = jax.jit(pl.pallas_call(
                _kernel,
                grid=(self.nrow_tiles,),
                in_specs=[
                    pl.BlockSpec(
                        (1, nblk), lambda i: (0, 0),
                        memory_space=pltpu.SMEM,
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
                    (TP_ROWS, ne), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (self.nrow_tiles * TP_ROWS, ne), jnp.float32
                ),
                interpret=interpret,
            ))
        return self._calls[key]

    def first_transform(
        self, TA, reach, interpret: bool = False, fetch: bool = True
    ):
        """Bi[P, mu, i] = sum_{nu reachable} B[P, mu, nu] TA[nu, i].

        ``fetch=False`` returns the device array: the half-transformed
        factor is naux*nao*nemb f32 (~0.5 GB at C40) and the follow-up
        second transform + Gram consume it on the chip — reading it back
        per fragment cost ~18 s/fragment over a tunneled link and was
        the whole wall of the f32 tier at chain scale.
        """
        TA = np.asarray(TA, np.float32)
        nemb = TA.shape[1]
        ne = (-(-nemb // 128)) * 128
        TAp = np.pad(TA, ((0, self.pad), (0, ne - nemb)))
        maskb = np.pad(
            np.asarray(reach, bool), (0, self.pad)
        ).reshape(self.nblk, NU_BLOCK).any(axis=1).astype(
            np.int32
        )[None, :]
        with jax.enable_x64(False):
            out = self._call(ne, interpret)(maskb, self.Bt_dev, TAp)
            dev = out[: self.rows, :nemb].reshape(
                self.naux, self.nao, nemb
            )
        if fetch:
            return np.asarray(dev)
        return dev


def screened_first_transform(B, TA, reach, interpret: bool = False):
    """One-shot wrapper over :class:`PallasDFFactor` (legacy surface).

    The kernel is traced with x64 disabled (Mosaic cannot legalize i64
    grid index arithmetic).  Callers transforming many fragments should
    hold a :class:`PallasDFFactor` instead — this wrapper re-prepares
    and re-uploads the factor every call.
    """
    return PallasDFFactor(B).first_transform(TA, reach, interpret)


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
