"""Device bisect: quality-scale train-step time vs round 4 (63-87 ms/step).

Round-5 full benches measured ~208 ms/step on the SAME workload + PSNR
curve, so a library default changed the step graph.  Suspects (the only
default-path diffs since 36d2660): NERFACC_DOUT_UNPACK lanes unpack
(new, default), u10 clamp (cheap).  This times 32 steps per config in
one process.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

import bench  # noqa: E402  (repo-root bench module)

print("backend:", jax.devices()[0].platform, flush=True)

from nerfacc_tpu.datasets.procedural import make_loaders

train_ds, test_ds = make_loaders(
    num_rays=8192, width=800, height=800, n_train=4, n_test=1, detail=1.0
)
print("dataset ready", flush=True)

main_cfg = dict(
    encoder_type="fused", n_levels=4, n_features_per_level=16,
    log2_hashmap_size=18,
)

CONFIGS = [
    ("defaults", {}),
    ("dout_t3", {"NERFACC_DOUT_UNPACK": "t3"}),
]

for name, env in CONFIGS:
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    t0 = time.perf_counter()
    run = bench._QualityRun(train_ds, test_ds, main_cfg, tag=name)
    run.compile()
    print(f"{name}: compile {time.perf_counter()-t0:.0f}s", flush=True)
    run.train(16)  # warm the post-warmup occ-update graph + caches
    run.train_elapsed = 0.0
    run.train(32)
    print(
        f"{name}: {run.train_elapsed/32*1000:.1f} ms/step "
        f"(32 steps, {run.train_elapsed:.1f}s)", flush=True,
    )
    for k, v in saved.items():
        if v is None:
            os.environ.pop(k, None)
        else:
            os.environ[k] = v
