"""Benchmark: fluoro frames/sec/chip at the 8x-downsample IPCAI configuration.

Measures the TPU-native inference path on the flagship model (depth-6 wf-5
U-Net, batch norm, learned downsampling, padding, joint 7-class seg +
14-landmark heads, 192x192 input, bfloat16 compute) — the full per-frame
device program: reflect-pad + z-norm + forward + argmax, matching what
seg_dataset_ensemble times in the reference (util.py:321-366: H2D + forward
+ argmax, excluding HDF5 writes).

Baseline: the same architecture transcribed to PyTorch (float32) on CPU —
the reference stack's non-GPU deployment target. The baseline measurement is
cached in bench_baseline.json so repeated bench runs only time the JAX path.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

IMG = 180  # 8x archive frames are ~180^2 (1436/8); padded to 192
PAD = 192
# Batch-size study (BASELINE.md, round 2, scalar-readback protocol):
# 32 -> 2060 f/s, 64 -> 3186, 128 -> 4093, 256 -> 5056, 512 -> 5248 (peak),
# 1024 -> 5123. The chip saturates near 512. (The round-1 "saturates at 32"
# finding was an artifact of full-array D2H transfers inside the timed loop.)
BATCH = 512
# The CPU baseline runs at a smaller batch: CPU throughput does NOT improve
# with batch (measured on this host: 2.11 f/s @ batch 32 vs 1.74 f/s @ 128 —
# slightly worse, memory pressure), so timing torch at 32 is conservative
# (favors the baseline), while a batch-512 torch forward takes ~5 min per
# iteration and would add ~50 min to every bench run.
TORCH_BATCH = 32
N_CLASSES = 7
N_LANDS = 14
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_baseline.json")
# Pinned FLOOR for the torch-CPU denominator (frames/sec). Provenance: the
# identical-architecture torch forward measured 2.1-3.0 f/s across rounds 1-3
# on this 1-CPU host under idle conditions (BASELINE.md "Same pipeline,
# PyTorch-CPU f32" row; round-2 median 2.78). Degraded sessions (loaded host /
# 8x-worse tunnel RTT) measured as low as 1.10 f/s — publishing a multiplier
# off such a session silently inflated vs_baseline 2.5x in round 3. The
# denominator is the best the competitor has demonstrated, so every fresh or
# cached measurement is clamped UP to this floor: vs_baseline is a LOWER
# bound, and a slow-session measure can only make it smaller, never larger.
# Re-pin only from a back-to-back median-of-10 on an idle host.
TORCH_BASELINE_FLOOR_FPS = 3.0


def bench_jax() -> float:
    import jax

    # persistent compile cache, SHARED with the CLIs/scripts (one cache dir:
    # the depth-6 programs are expensive over the remote-compile tunnel and
    # a bench-private dir would re-pay compiles the tools already did)
    from deepfluoro_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()

    import jax.numpy as jnp

    from deepfluoro_tpu.data.augment import AugmentConfig, prepare_batch
    from deepfluoro_tpu.train import TrainConfig, build_model

    cfg = TrainConfig(
        num_classes=N_CLASSES, depth=6, init_feats_exp=5, batch_norm=True,
        padding=True, no_max_pool=True, num_lands=N_LANDS, proj_unet_dim=PAD,
        compute_dtype="bfloat16",
    )
    model = build_model(cfg)
    rng = np.random.default_rng(0)

    dummy = jnp.zeros((1, PAD, PAD, 1), jnp.float32)
    # jit the init: eager init dispatches hundreds of tiny ops (very slow
    # over a remote-device tunnel) and a jitted init hits the compile cache
    variables = jax.jit(
        lambda k, x: model.init(k, x, train=False)
    )(jax.random.PRNGKey(0), dummy)

    aug = AugmentConfig(
        num_classes=N_CLASSES, proj_pad_dim=PAD, prob_of_aug=0.0,
        include_heat_map=False,
    )
    key = jax.random.PRNGKey(0)

    @jax.jit
    def infer(variables, projs):
        prepared = prepare_batch(aug, key, projs)
        seg, heats = model.apply(variables, prepared["proj"], train=False)
        labels = jnp.argmax(seg, axis=-1).astype(jnp.uint8)
        return labels

    projs = jnp.asarray(rng.random((BATCH, IMG, IMG), np.float32))

    # warmup / compile; np.asarray forces a real device round-trip (some
    # remote backends return from block_until_ready before execution ends)
    _ = np.asarray(infer(variables, projs))

    def drain(labels):
        # force execution via a SCALAR readback: the TPU stream is serial, so
        # fetching one element drains every queued step without paying a
        # full-array D2H transfer over the tunnel inside the timed region
        return np.asarray(labels[0, 0, 0])

    best = 0.0
    for _trial in range(3):
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            labels = infer(variables, projs)
        drain(labels)
        dt = time.perf_counter() - t0
        best = max(best, BATCH * iters / dt)
    return best


def _torch_unet(torch, nn):
    """Reference-equivalent architecture in torch (independent transcription
    of the paper config for a like-for-like speed baseline)."""

    class Block(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, padding=1)
            self.b1 = nn.BatchNorm2d(cout)
            self.c2 = nn.Conv2d(cout, cout, 3, padding=1)
            self.b2 = nn.BatchNorm2d(cout)
            self.res = nn.Conv2d(cin, cout, 1)

        def forward(self, x):
            y = self.b1(torch.relu(self.c1(x)))
            y = self.b2(torch.relu(self.c2(y)))
            return y + self.res(x)

    class Net(nn.Module):
        def __init__(self, depth=6, wf=5):
            super().__init__()
            chans = [2 ** (wf + i) for i in range(depth)]
            self.downs = nn.ModuleList()
            self.pools = nn.ModuleList()
            cin = 1
            for i, c in enumerate(chans):
                self.downs.append(Block(cin, c))
                cin = c
                if i != depth - 1:
                    self.pools.append(nn.Conv2d(c, c, 2, stride=2))
            self.ups = nn.ModuleList()
            self.upblocks = nn.ModuleList()
            for i in reversed(range(depth - 1)):
                self.ups.append(nn.ConvTranspose2d(cin, chans[i], 2, stride=2))
                self.upblocks.append(Block(cin, chans[i]))
                cin = chans[i]
            self.seg = nn.Conv2d(cin, N_CLASSES, 1, bias=False)
            self.l1 = nn.Conv2d(cin + N_CLASSES, N_LANDS + N_CLASSES, 1, bias=False)
            self.l2 = nn.Conv2d(N_LANDS + N_CLASSES, N_LANDS, 1, bias=False)

        def forward(self, x):
            skips = []
            for i, d in enumerate(self.downs):
                x = d(x)
                if i != len(self.downs) - 1:
                    skips.append(x)
                    x = self.pools[i](x)
            for up, ub, sk in zip(self.ups, self.upblocks, reversed(skips)):
                x = torch.cat([up(x), sk], dim=1)
                x = ub(x)
            seg_logits = self.seg(x)
            seg = torch.softmax(seg_logits, dim=1)
            h = torch.cat([x, seg_logits], dim=1)
            heats = self.l2(self.l1(h))
            return seg, heats

    return Net()


def bench_torch_cpu() -> float:
    """Torch-CPU baseline in frames/sec. Measured at TORCH_BATCH (CPU
    throughput is batch-flat past ~8, see the constant's note) so the
    per-frame ratio against the TPU number is still like-for-like."""
    import torch
    import torch.nn as nn

    net = _torch_unet(torch, nn).eval()
    rng = np.random.default_rng(0)
    x = torch.from_numpy(rng.random((TORCH_BATCH, 1, PAD, PAD)).astype(np.float32))

    with torch.no_grad():
        net(x)  # warmup
        # median of per-iteration times over a real loop: a single forward
        # per trial swings +-20% on CPU and would make vs_baseline unstable
        iters = 10
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            seg, heats = net(x)
            torch.argmax(seg, dim=1)
            times.append(time.perf_counter() - t0)
    return TORCH_BATCH / float(np.median(times))


def get_torch_baseline() -> float:
    """The torch-CPU denominator: cached (or freshly measured) frames/sec,
    clamped up to TORCH_BASELINE_FLOOR_FPS so one slow-session measurement
    can never inflate the published multiplier (see the floor's note)."""
    config = "depth6 wf5 192x192 f32 batch{} median10".format(TORCH_BATCH)
    fps = None
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        if cached.get("config") == config:
            fps = float(cached["torch_cpu_frames_per_sec"])
    if fps is None:
        fps = bench_torch_cpu()
        try:
            with open(BASELINE_CACHE, "w") as f:
                json.dump({"torch_cpu_frames_per_sec": fps, "config": config}, f)
        except OSError:
            pass
    return max(fps, TORCH_BASELINE_FLOOR_FPS)


def main():
    baseline = get_torch_baseline()
    fps = bench_jax()
    print(
        json.dumps(
            {
                "metric": "fluoro_frames_per_sec_per_chip_8x",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / baseline, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
