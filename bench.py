"""Benchmark: images/sec/chip for the flagship segmentor (BASELINE.json metric).

Runs eval-mode forward (the serving path) of ViT-Adapter-L + Mask2Former at
ADE20K 512px on the available chip, bf16 activations, jit-compiled,
preprocessing fused. Prints ONE JSON line.

Methodology notes (axon TPU tunnel):
  * `block_until_ready` does NOT synchronize through the tunnel — only
    materializing a value does, so the timer closes over a scalar fetch.
  * each dispatch costs ~25 ms of tunnel latency, so N iterations run inside
    one jit (`lax.fori_loop`, output-carried dependency so nothing is DCE'd)
    and the n=1 cost is subtracted.

The reference publishes no throughput numbers (SURVEY §6); the baseline
anchor below is this framework's first measured round-1 value, so
vs_baseline tracks our own progress.
"""

import json
import sys
import time

import jax

from vitadapter.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import jax.numpy as jnp
import numpy as np

# First measured value (round 1, ViT-Adapter-L Mask2Former 512px bf16 eval
# forward, TPU v5e single chip via axon, corrected synchronization).
BASELINE_IMG_PER_SEC = 1.202


def build_flagship(dtype=jnp.bfloat16):
    try:
        from vitadapter.zoo import mask2former_vit_adapter  # noqa: F401
        model = mask2former_vit_adapter("large", dtype=dtype)
        name = "ViT-Adapter-L Mask2Former"
    except ImportError:
        from vitadapter.zoo import upernet_vit_adapter
        model = upernet_vit_adapter("large", dtype=dtype)
        name = "ViT-Adapter-L UperNet"
    return model, name


# Analytic forward FLOPs per image for ViT-Adapter-L + Mask2Former at 512px
# (backbone 24xViT-L blocks on 1024 tokens + SPM/adapter MSDA + 6-layer pixel
# decoder on 5376 tokens + 9-layer Q=200 decoder; dense-matmul count).
FLOPS_PER_IMG = 2.2e12
# Train step: fwd + bwd of the matmul-dominated graph ~ 3x fwd (the loss
# tail's point sampling/assignment adds non-matmul work not counted here).
TRAIN_FLOPS_PER_IMG = 3 * FLOPS_PER_IMG
PEAK_FLOPS = 197e12  # TPU v5e bf16
# First measured value (round 5, same flagship, 512px batch-2 train step).
BASELINE_TRAIN_S_PER_STEP = 0.90


def measure(model, batch, H=512, W=512):
    from vitadapter.data.preprocess import normalize

    raw = jnp.asarray(
        np.random.RandomState(0).randint(0, 256, (batch, H, W, 3), np.uint8))
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), normalize(raw, dtype=jnp.bfloat16))

    def forward(variables, img):
        return model.apply(variables, img)

    def timed(n):
        @jax.jit
        def run(variables, raw):
            def body(i, acc):
                img = normalize(raw, dtype=jnp.bfloat16)
                # acc-dependence serializes iterations and defeats DCE
                img = img + (acc * 0).astype(img.dtype)
                out = forward(variables, img)
                return acc + out.astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))
        float(run(variables, raw))  # compile + warm
        # median of repeats: tunnel dispatch latency is jittery (tens of ms)
        # and no longer negligible against the measured compute
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            s = float(run(variables, raw))  # scalar fetch = real sync
            assert np.isfinite(s)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    t1 = timed(1)
    tn = timed(11)
    per_iter = (tn - t1) / 10.0
    assert per_iter > 0, (tn, t1)
    return batch / per_iter


def measure_train(batch, size=512, num_points=12544):
    """Full flagship train step (loss + bwd + optimizer, donated state),
    timed like tools/profile_train.py. Returns s/step."""
    from vitadapter.train.optim import make_optimizer
    from vitadapter.train.trainer import TrainState, make_m2f_train_step
    from vitadapter.zoo import mask2former_vit_adapter

    model = mask2former_vit_adapter("large", num_classes=150,
                                    dtype=jnp.bfloat16)
    img = jnp.zeros((batch, size, size, 3), jnp.float32)
    variables = jax.jit(lambda k, x: model.init(k, x, train=True))(
        jax.random.PRNGKey(0), img)
    tx, _ = make_optimizer(variables["params"], total_steps=1000,
                           warmup_steps=10, grad_clip=0.01)
    state = TrainState.create(variables["params"], variables["batch_stats"],
                              tx)
    data = {
        "image": jnp.asarray(
            np.random.RandomState(0).randn(batch, size, size, 3),
            jnp.float32),
        "label": jnp.asarray(np.random.RandomState(1).randint(
            0, 150, (batch, size, size)), jnp.int32),
    }
    rng = jax.random.PRNGKey(2)
    step = jax.jit(make_m2f_train_step(model, num_classes=150,
                                       max_instances=60,
                                       num_points=num_points),
                   donate_argnums=(0,))
    state, m = step(state, data, rng)
    assert np.isfinite(float(m["loss"]))  # compile + warm + sync
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, data, rng)
    assert np.isfinite(float(m["loss"]))  # scalar fetch = real sync
    return (time.perf_counter() - t0) / n


def main():
    model, name = build_flagship()
    # throughput/chip is the metric; sweep batch and report the best
    # (VERDICT r3 next #3a)
    results = {}
    for batch in (4, 8, 16):
        try:
            results[batch] = measure(model, batch)
        except Exception as e:  # noqa: BLE001 — e.g. OOM at large batch
            if "RESOURCE_EXHAUSTED" not in str(e) and "Out of memory" \
                    not in str(e):
                raise
            break
    batch, img_s = max(results.items(), key=lambda kv: kv[1])

    # flagship train step (VERDICT r4 next #6: training progress must reach
    # the driver artifact, not README prose)
    train = {}
    del model
    for tb in (2, 4):
        try:
            s_step = measure_train(tb)
        except Exception as e:  # noqa: BLE001 — e.g. OOM at large batch
            oom = ("RESOURCE_EXHAUSTED" in str(e)
                   or "Out of memory" in str(e))
            if oom or train:
                # OOM ends the sweep; a transient failure on a LATER batch
                # (fresh multi-minute compile through a flaky tunnel) must
                # not discard the batches already measured — report what we
                # have rather than retry the whole bench.
                print(f"train batch {tb} skipped: {type(e).__name__}",
                      file=sys.stderr)
                break
            raise
        train[str(tb)] = {
            "s_per_step": round(s_step, 4),
            "img_per_s": round(tb / s_step, 3),
            "mfu": round(tb / s_step * TRAIN_FLOPS_PER_IMG / PEAK_FLOPS, 4),
        }

    vs = 1.0 if BASELINE_IMG_PER_SEC is None else img_s / BASELINE_IMG_PER_SEC
    out = {
        "metric": f"images/sec/chip ({name}, ADE20K 512px eval forward, "
                  f"batch {batch})",
        "value": round(img_s, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(vs, 3),
        "mfu": round(img_s * FLOPS_PER_IMG / PEAK_FLOPS, 4),
        "batch_sweep": {str(b): round(v, 3) for b, v in results.items()},
    }
    if train:
        b2 = train.get("2")
        out["train"] = {
            "batch_sweep": train,
            "s_per_step_b2": b2["s_per_step"] if b2 else None,
            "vs_train_baseline": (round(BASELINE_TRAIN_S_PER_STEP
                                        / b2["s_per_step"], 3)
                                  if b2 else None),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    # the axon terminal's Pallas compile helper fails in streaks (its libtpu
    # init flakes with an HTTP 500) and the tunnel itself can drop for
    # minutes (backend init raises Unavailable); retry through short outages
    for _attempt in range(4):
        try:
            main()
            break
        except Exception as e:  # noqa: BLE001
            transient = ("remote_compile" in str(e)
                         or "UNAVAILABLE" in str(e)
                         or "Unable to initialize backend" in str(e))
            print(f"bench attempt {_attempt} failed "
                  f"({'transient' if transient else 'fatal'}): "
                  f"{type(e).__name__}: {str(e)[:300]}", file=sys.stderr)
            if not transient or _attempt == 3:
                raise
            time.sleep(240)
