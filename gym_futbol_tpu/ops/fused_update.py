"""Fused PPO minibatch gradient: forward + analytic backward in ONE
Mosaic kernel (the config-5 update-path optimization, VERDICT r2 item 1).

The XLA update path costs ~64 ms per minibatch SGD step at config 5
(measured, parity/profile_update.py): every [hidden, mb] activation and
its backward twin round-trips through HBM, and the minibatch gather
materializes a copy of the obs block. This kernel removes both:

- The grid walks the minibatch one SAMPLE BLOCK (``block`` columns of the
  feature-major obs matrix) at a time; the per-epoch shuffle permutation
  arrives as a SCALAR-PREFETCH index array. The small per-sample rows
  (packed actions, old logp/value, returns) ride Mosaic's automatic
  pipeline as [1, sub, 128] tiles indexed by ``idx[i]``; the obs matrix
  stays in HBM (`pl.ANY`) and each step's [F, block] column slab is
  DOUBLE-BUFFER DMA'd in permuted order — the minibatch gather is free.
- Forward (torso tanh MLP -> logits + value heads), the clipped-surrogate
  loss math, and the HAND-WRITTEN backward all run on that VMEM-resident
  slab; only the parameter-sized gradients and [4, sub, 128] metric
  accumulators ever leave the core (outputs revisit block (0, ..) every
  grid step, so Mosaic keeps them VMEM-resident and accumulates).
- Matmuls run on the MXU with bfloat16 operands and float32 accumulation
  (``compute_dtype``); gradient accumulation across blocks stays f32.

Gradient math (certified against jax.grad(ppo_loss) by
tests/test_ops.py::TestFusedUpdate in interpret mode and
parity/check_fused_update.py on-chip):

  d loss / d logp   = -inv_M * adv_n * ratio * pick,
                      pick = 1[pg1 <= pg2] or 1[|ratio - 1| <= eps]
  d loss / d logits = dlogp * (onehot(a) - p) + inv_M*ent_coef*p*(logp + H)
  d loss / d value  = inv_M * vf_coef * (e1 if e1^2 >= e2^2 else
                      e2 * 1[|v - v_old| <= eps]),  e = v* - ret
  (adv_n is the minibatch-normalized advantage — constant w.r.t. params,
  so pre-normalizing outside the kernel is exact, not an approximation.
  Action indices must be in-range 0..4 — guaranteed by pack_actions / the
  collect kernels — or the one-hot gradient deviates from autodiff's.)

Weight layout is ops.fused_collect.flatten_actor_critic order:
(W1, b1, ..., Wt, bt, Wl, bl, Wv, bv), W [in, out], b [out, 1].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_CHOICES = 5
_LANE = 128

# metric row order in the [4, sub, 128] accumulator
_METRICS = ("pg_loss", "v_loss", "entropy", "approx_kl")


def _update_kernel(n_torso: int, n_groups: int, block: int,
                   n_mb_blocks: int, clip_eps: float, vf_coef: float,
                   ent_coef: float, inv_m: float, compute_dtype):
    """Kernel factory. Refs after the prefetched idx: weights
    (2*(n_torso+2), VMEM), obs [F, N] (HBM, manual DMA of lane slabs),
    dirs/acts/logp/value/ret [1, sub, 128] (pipelined via idx), adv_n
    [1, sub, 128]; outputs: grads (weight shapes) + metrics
    [4, sub, 128]; scratch: obs slab [2, F, block] + 2 DMA semaphores."""
    n_w = 2 * (n_torso + 2)
    sub = block // _LANE

    # with f32 compute, force true-f32 MXU passes (Mosaic's default f32
    # matmul is single-pass bf16 — the parity gate needs the exact path)
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else None)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a.astype(compute_dtype), b.astype(compute_dtype), (dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

    def dot32(a, b, dims):
        # f32 path for the degenerate value-head contractions (an operand
        # or output has a size-1 dim): Mosaic lowers those via
        # broadcast-reduce, which mis-verifies on mixed bf16->f32; the
        # FLOPs are 1/hidden of the layer dots, so f32 costs nothing
        return jax.lax.dot_general(
            a, b, (dims, ((), ())), preferred_element_type=jnp.float32,
            precision=prec,
        )

    def kernel(idx_ref, *refs):
        # scalar constants built in-trace from Python floats (Mosaic
        # rejects closure-captured array constants)
        eps = jnp.float32(clip_eps)
        c_v = jnp.float32(vf_coef * inv_m)
        c_ent = jnp.float32(ent_coef * inv_m)
        c_pg = jnp.float32(inv_m)
        one = jnp.float32(1.0)
        w = [refs[i] for i in range(n_w)]
        (obs_hbm, dirs_ref, acts_ref, logp_ref, value_ref, ret_ref,
         adv_ref) = refs[n_w:n_w + 7]
        g_refs = refs[n_w + 7:2 * n_w + 7]
        m_ref = refs[2 * n_w + 7]
        obs_buf = refs[2 * n_w + 8]
        sem = refs[2 * n_w + 9]

        i = pl.program_id(0)
        slot = jax.lax.rem(i, 2)

        def obs_dma(s, mb_i):
            # lane-dim slab of the [F, N] matrix: offset idx*block is a
            # multiple of 128, so the DMA slice is tile-aligned
            return pltpu.make_async_copy(
                obs_hbm.at[:, pl.ds(idx_ref[mb_i] * block, block)],
                obs_buf.at[s], sem.at[s],
            )

        @pl.when(i == 0)
        def _():
            obs_dma(0, 0).start()

        @pl.when(i + 1 < n_mb_blocks)
        def _():
            obs_dma(jax.lax.rem(i + 1, 2), i + 1).start()

        obs_dma(slot, i).wait()
        x = obs_buf[slot]                           # [F, block]
        dirs = dirs_ref[0].reshape(block)           # [block] i32
        acts = acts_ref[0].reshape(block)
        logp_old = logp_ref[0].reshape(block)
        value_old = value_ref[0].reshape(block)
        ret = ret_ref[0].reshape(block)
        adv = adv_ref[0].reshape(block)             # minibatch-normalized

        # ---- forward (keep post-tanh activations for the backward) ----
        hs = [x]
        for li in range(n_torso):
            z = dot(w[2 * li][:], hs[-1], ((0,), (0,))) + w[2 * li + 1][:]
            hs.append(jnp.tanh(z))
        h_last = hs[-1]
        wl, bl = w[2 * n_torso], w[2 * n_torso + 1]
        wv, bv = w[2 * n_torso + 2], w[2 * n_torso + 3]
        logits = dot(wl[:], h_last, ((0,), (0,))) + bl[:]   # [G5, block]
        value = (dot32(wv[:], h_last, ((0,), (0,))) + bv[:])[0]  # [block]

        # ---- loss math + dlogits rows (row form; see module docstring) -
        logp_rows, p_rows, taken_idx = [], [], []
        logp_total, ent_total = None, None
        for g in range(n_groups):
            rows = [logits[g * N_CHOICES + k] for k in range(N_CHOICES)]
            m = rows[0]
            for r in rows[1:]:
                m = jnp.maximum(m, r)
            exps = [jnp.exp(r - m) for r in rows]
            z = exps[0]
            for e in exps[1:]:
                z = z + e
            inv_z = one / z
            logz = jnp.log(z)
            lp = [r - m - logz for r in rows]
            p = [e * inv_z for e in exps]
            pg_, slot_a = g // 2, g % 2
            packed = dirs if slot_a == 0 else acts
            a = (packed >> (3 * pg_)) & 7
            taken = lp[0]
            ent = -p[0] * lp[0]
            for k in range(1, N_CHOICES):
                taken = jnp.where(a == k, lp[k], taken)
                ent = ent - p[k] * lp[k]
            logp_rows.append(lp)
            p_rows.append(p)
            taken_idx.append(a)
            logp_total = taken if logp_total is None else logp_total + taken
            ent_total = ent if ent_total is None else ent_total + ent

        ratio = jnp.exp(logp_total - logp_old)
        pg1 = ratio * adv
        clipped = jnp.clip(ratio, one - eps, one + eps)
        pg2 = clipped * adv
        pg_vec = -jnp.minimum(pg1, pg2)
        inclip = ((ratio >= one - eps) & (ratio <= one + eps)).astype(
            jnp.float32
        )
        pick = jnp.where(pg1 <= pg2, one, inclip)
        dlogp = -c_pg * adv * ratio * pick          # [block]

        dv_raw = value - value_old
        v_clipped = value_old + jnp.clip(dv_raw, -eps, eps)
        e1 = value - ret
        e2 = v_clipped - ret
        v_vec = jnp.float32(0.5) * jnp.maximum(e1 * e1, e2 * e2)
        inclip_v = ((dv_raw >= -eps) & (dv_raw <= eps)).astype(jnp.float32)
        dvalue = c_v * jnp.where(e1 * e1 >= e2 * e2, e1, e2 * inclip_v)

        dl_rows = []
        for g in range(n_groups):
            lp, p, a = logp_rows[g], p_rows[g], taken_idx[g]
            h_g = jnp.zeros_like(ent_total)
            for k in range(N_CHOICES):
                h_g = h_g - p[k] * lp[k]
            for k in range(N_CHOICES):
                onehot = (a == k).astype(jnp.float32)
                dl_rows.append(
                    dlogp * (onehot - p[k]) + c_ent * p[k] * (lp[k] + h_g)
                )
        dlogits = jnp.stack(dl_rows)                # [G5, block]
        dvalue2 = dvalue.reshape(1, block)

        # ---- backward matmuls (all MXU; dx of the input is not needed) -
        grads = [None] * n_w
        dh = (dot(wl[:], dlogits, ((1,), (0,)))
              + dot32(wv[:], dvalue2, ((1,), (0,))))  # [H_last, block]
        grads[2 * n_torso] = dot(h_last, dlogits, ((1,), (1,)))   # dWl
        grads[2 * n_torso + 1] = jnp.sum(dlogits, axis=1, keepdims=True)
        grads[2 * n_torso + 2] = dot32(h_last, dvalue2, ((1,), (1,)))  # dWv
        grads[2 * n_torso + 3] = jnp.sum(dvalue2, axis=1, keepdims=True)
        for li in range(n_torso - 1, -1, -1):
            h = hs[li + 1]
            dz = dh * (one - h * h)
            grads[2 * li] = dot(hs[li], dz, ((1,), (1,)))          # dW
            grads[2 * li + 1] = jnp.sum(dz, axis=1, keepdims=True)
            if li > 0:
                dh = dot(w[2 * li][:], dz, ((1,), (0,)))

        m_tiles = [
            pg_vec.reshape(sub, _LANE),
            v_vec.reshape(sub, _LANE),
            ent_total.reshape(sub, _LANE),
            ((ratio - one) - (logp_total - logp_old)).reshape(sub, _LANE),
        ]

        first = i == 0

        @pl.when(first)
        def _():
            for k in range(n_w):
                g_refs[k][:] = grads[k]
            for k in range(4):
                m_ref[k] = m_tiles[k]

        @pl.when(jnp.logical_not(first))
        def _():
            for k in range(n_w):
                g_refs[k][:] = g_refs[k][:] + grads[k]
            for k in range(4):
                m_ref[k] = m_ref[k] + m_tiles[k]

    return kernel


@partial(
    jax.jit,
    static_argnames=("n_torso", "clip_eps", "vf_coef", "ent_coef",
                     "block", "interpret", "compute_dtype"),
)
def fused_minibatch_grad(
    weights: tuple,
    obs_fm: jax.Array,      # [F, N] f32, feature-major (N contiguous
                            # blocks of `block` samples; idx is in blocks)
    dirs_blk: jax.Array,    # [n_blocks, block] i32 (bit-packed)
    acts_blk: jax.Array,
    logp_blk: jax.Array,    # [n_blocks, block] f32
    value_blk: jax.Array,
    ret_blk: jax.Array,
    adv_n: jax.Array,       # [mb_blocks, block] f32, NORMALIZED + gathered
    idx: jax.Array,         # [mb_blocks] i32 permuted block indices
    *,
    n_torso: int,
    clip_eps: float,
    vf_coef: float,
    ent_coef: float,
    block: int,
    interpret: bool = False,
    compute_dtype=jnp.bfloat16,
):
    """One PPO minibatch gradient + metric sums (see module docstring).

    Returns (grads tuple matching ``weights`` shapes/order, metric sums
    dict over _METRICS — divide by the minibatch size for means; the
    1/M loss scaling is already inside the gradients).
    """
    f_dim, n_samples = obs_fm.shape
    assert n_samples % block == 0 and block % _LANE == 0
    assert f_dim % 8 == 0, (
        f"obs feature rows {f_dim} must be padded to a multiple of 8 "
        f"(zero rows; the collect kernel emits this) for tile-aligned "
        f"DMA slabs"
    )
    f_w = weights[0].shape[0]
    if f_w != f_dim:
        # pad the first layer's weights with zero rows to match the
        # zero-padded obs (exact: contributes 0); dW1's pad rows are
        # sliced off below
        weights = (jnp.pad(weights[0], ((0, f_dim - f_w), (0, 0))),
                   *weights[1:])
    n_blocks = n_samples // block
    mb_blocks = idx.shape[0]
    sub = block // _LANE
    inv_m = 1.0 / float(mb_blocks * block)
    g5 = weights[2 * n_torso].shape[1]
    assert g5 % N_CHOICES == 0

    # per-sample rows ride the automatic pipeline as (1, sub, 128) tiles
    tile3 = lambda x: x.reshape(n_blocks, sub, _LANE)
    full = lambda w: pl.BlockSpec(
        w.shape, lambda i, idx: (0,) * w.ndim, memory_space=pltpu.VMEM
    )
    row = pl.BlockSpec((1, sub, _LANE), lambda i, idx: (idx[i], 0, 0),
                       memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mb_blocks,),
        in_specs=[
            *[full(w) for w in weights],
            pl.BlockSpec(memory_space=pl.ANY),      # obs stays in HBM
            row, row, row, row, row,
            pl.BlockSpec((1, sub, _LANE), lambda i, idx: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            *[pl.BlockSpec(w.shape, lambda i, idx: (0,) * w.ndim,
                           memory_space=pltpu.VMEM) for w in weights],
            pl.BlockSpec((4, sub, _LANE), lambda i, idx: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, f_dim, block), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shape = [
        *[jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights],
        jax.ShapeDtypeStruct((4, sub, _LANE), jnp.float32),
    ]
    out = pl.pallas_call(
        _update_kernel(
            n_torso, g5 // N_CHOICES, block, mb_blocks, clip_eps, vf_coef,
            ent_coef, inv_m, compute_dtype,
        ),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(
        jnp.asarray(idx, jnp.int32), *weights, obs_fm, tile3(dirs_blk),
        tile3(acts_blk), tile3(logp_blk), tile3(value_blk), tile3(ret_blk),
        adv_n.reshape(mb_blocks, sub, _LANE),
    )
    grads = tuple(out[: len(weights)])
    if f_w != f_dim:
        grads = (grads[0][:f_w], *grads[1:])
    m = out[len(weights)]
    metrics = {name: jnp.sum(m[k]) for k, name in enumerate(_METRICS)}
    return grads, metrics


def unflatten_actor_critic(grads: tuple, model) -> dict:
    """Flat (dW, db, ...) kernel-order tuple -> flax ActorCritic variables
    pytree (the inverse of ops.fused_collect.flatten_actor_critic)."""
    n_dense = len(model.hidden) + 2
    assert len(grads) == 2 * n_dense
    return {
        "params": {
            f"Dense_{i}": {
                "kernel": grads[2 * i],
                "bias": grads[2 * i + 1].reshape(-1),
            }
            for i in range(n_dense)
        }
    }
