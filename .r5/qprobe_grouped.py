"""Device probe: grouped-encoder quality arms at the 800x800 proxy scale.

Device full-bench evidence: grouped v2 (split4+tri) reaches only
23.6 dB @400 steps vs fused 35.6, while the 160x160 CPU repro predicted
a 1.8 dB gap — something scale-dependent.  Arms (env-selected, run
sequentially in one process; each ~400 steps):

  split8   NERFACC_GROUPED_SPLIT=8   pure per-level corner-fused keys
  keycap0  NERFACC_GROUPED_KEYCAP=0  window-finest keys
  f32      BENCH_DTYPE=f32           precision-at-scale control
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import bench  # noqa: E402

print("backend:", jax.devices()[0].platform, flush=True)

from nerfacc_tpu.datasets.procedural import make_loaders

train_ds, test_ds = make_loaders(
    num_rays=8192, width=800, height=800, n_train=36, n_test=1, detail=1.0
)
print("dataset ready", flush=True)

cfg = dict(
    encoder_type="grouped", n_levels=16, n_features_per_level=2,
    log2_hashmap_size=19,
)

ARMS = [a for a in os.environ.get(
    "QPROBE_ARMS", "split8,keycap0"
).split(",") if a]
ENVS = {
    "control": {},
    "split8": {"NERFACC_GROUPED_SPLIT": "8"},
    "keycap0": {"NERFACC_GROUPED_KEYCAP": "0"},
    "f32": {"BENCH_DTYPE": "f32"},
    "f32cap0": {"BENCH_DTYPE": "f32", "NERFACC_GROUPED_KEYCAP": "0"},
    "cap0split8": {
        "NERFACC_GROUPED_KEYCAP": "0", "NERFACC_GROUPED_SPLIT": "8",
    },
    "saw": {"NERFACC_GROUPED_WB": "saw"},
}
STEPS = int(os.environ.get("QPROBE_STEPS", "400"))

for arm_spec in ARMS:
    arm, _, n_str = arm_spec.partition(":")
    arm_steps = int(n_str) if n_str else STEPS
    env = ENVS[arm]
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        import numpy as _np

        # Same batch sequence for every arm: the loader RNG is stateful
        # across arms and batch-sequence variance is ±5 dB at step 400
        # (keycap0 measured 28.28 then 23.37 on identical configs).
        train_ds._rng = _np.random.default_rng(0)
        t0 = time.perf_counter()
        run = bench._QualityRun(train_ds, test_ds, cfg, tag=arm)
        run.compile()
        print(f"{arm}: compile {time.perf_counter()-t0:.0f}s", flush=True)
        while run.step < arm_steps:
            run.train(min(100, arm_steps - run.step))
            psnr = run.eval_psnr()
            print(
                f"{arm}: step={run.step} psnr={psnr:.2f} "
                f"t={run.train_elapsed:.1f}s", flush=True,
            )
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"{arm}: FAILED {e!r}", flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
