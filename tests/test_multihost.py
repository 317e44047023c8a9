"""Multi-host data parallelism without a cluster (VERDICT.md round-1 item 5).

Launches TWO real OS processes, each with 4 virtual CPU devices, connected by
``jax.distributed.initialize`` — the global mesh spans 8 devices across the
processes. Each process materializes only its row-shard of the global batch
(``Loader(process_shard=...)``) and the jitted SPMD train step runs with
cross-process collectives.

Proof obligations (see the in-test comments for the probed rationale):
- per-process sharding: each process builds half the global batch, and the
  assembled per-device shards are bit-identical to the single-process run;
- the two worker processes agree bit-for-bit on grads, params and metrics;
- vs the single-process 8-device run: the global CE grad matches to psum
  reduction-order noise and the supervised/cycle losses reproduce;
- the FULL runner works end-to-end across processes (second test): grain
  row sharding (stream-equivalent to Loader since round 3), sharded
  train+eval, orbax multihost checkpointing.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

ROOT = Path(__file__).resolve().parent.parent

# The training loop both worker processes and the in-process reference run.
# kept importable-free (subprocesses get it via -c) and configured tiny.
_WORKER = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass

COORD, PID = sys.argv[1], int(sys.argv[2])
if PID >= 0:
    jax.distributed.initialize(coordinator_address=COORD, num_processes=2,
                               process_id=PID,
                               heartbeat_timeout_seconds=600,
                               shutdown_timeout_seconds=1200)
jax.config.update("jax_default_matmul_precision", "highest")
sys.path.insert(0, %(root)r)
from cyclegan_tpu.utils.cpuflags import pin_cpu_compile_cache
pin_cpu_compile_cache()

import jax.numpy as jnp
from cyclegan_tpu.data.datasets import make_dataset, split_labeled
from cyclegan_tpu.data.loader import Loader, paired_iterator
from cyclegan_tpu.parallel import make_mesh, replicate_state, shard_batch, jit_step
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config

assert jax.device_count() == 8, jax.device_count()
shard = (jax.process_index(), jax.process_count()) if PID >= 0 else None

cfg = Config(gen_net="resnet_6blocks", ngf=4, ndf=4, bf16=False,
             crop_height=24, crop_width=24, batch_size=8, pool_size=0,
             labeled_fraction=0.5, epochs=10, decay_epoch=5)
ds = make_dataset("synthetic", size=32)
lab_ds, unlab_ds = split_labeled(ds, cfg.labeled_fraction, seed=0)
mk = lambda d, s: Loader(d, batch_size=8, crop_hw=(24, 24), train=True,
                         seed=s, process_shard=shard)
lab_l, unlab_l = mk(lab_ds, 0), mk(unlab_ds, 1)
tr = CycleGANTrainer(cfg, 21, 3, steps_per_epoch=2)
mesh = make_mesh(8)

from jax.experimental import multihost_utils

# Initialize the cross-process (gloo) collective context with a trivial
# barrier BEFORE the minutes-long train-step compile: gloo's context
# bring-up has a ~30 s peer timeout, and without this, the faster process
# reaches its first real collective while the slower one is still
# compiling.
multihost_utils.sync_global_devices("gloo-warmup")

state = replicate_state(tr.init_state(jax.random.PRNGKey(0)), mesh)
step = jit_step(tr.train_step)
batches = []
for lab_b, unlab_b in paired_iterator(lab_l, unlab_l, 0, mode="zip"):
    batches.append(shard_batch({"lab_image": lab_b["image"],
                                "lab_label": lab_b["label"],
                                "unlab_image": unlab_b["image"]}, mesh))
    if len(batches) >= 2:
        break
# Direct global-grad probe: CE grad of G_i2l on the sharded global batch —
# XLA psums it over the mesh. Cross-setup agreement here IS the
# "identical global grads" proof (psum-order noise only, no Adam
# sign-amplification).
from cyclegan_tpu.train import losses as L


def probe_loss(params, batch):
    out = tr.G_i2l.apply(params, batch["lab_image"])
    return L.cross_entropy_loss(out, batch["lab_label"], ignore_index=255)


grad_jit = jax.jit(jax.grad(probe_loss))

# Float64 adversarial/D probe (VERDICT r2 item 6): the f32 assertions used
# to carve out the adversarial terms because CPU-backend scheduling noise
# (~1e-7) through the leaky-relu kinks of near-zero PatchGAN scores
# amplified to ~1e-2. In f64 the reduction-order noise is ~1e-16, so the
# FULL adversarial/D path — G applies, D applies on the fakes, LSGAN MSE,
# and the D-parameter grads with their psum — is asserted cross-setup.
import jax.numpy as jnp64  # noqa: F401  (x64 enabled below)

jax.config.update("jax_enable_x64", True)
from cyclegan_tpu.models import define_Dis, define_Gen

G64_i2l = define_Gen(21, cfg.ngf, "resnet_6blocks", cfg.norm, False,
                     head="none", dtype=jnp.float64)
G64_l2i = define_Gen(3, cfg.ngf, "resnet_6blocks", cfg.norm, False,
                     head="tanh", dtype=jnp.float64)
D64_img = define_Dis(cfg.ndf, cfg.dis_net, cfg.n_layers_D, cfg.norm,
                     dtype=jnp.float64)
D64_lab = define_Dis(cfg.ndf, cfg.dis_net, cfg.n_layers_D, cfg.norm,
                     dtype=jnp.float64)
c64 = lambda tree: jax.tree.map(lambda t: t.astype(jnp.float64), tree)


def adv_probe(d_params, batch):
    dp_img, dp_lab = d_params
    unlab = batch["unlab_image"].astype(jnp.float64)
    oh = jax.nn.one_hot(batch["lab_label"], 21, dtype=jnp.float64)
    fake_lab = jax.nn.softmax(
        G64_i2l.apply(c64(state.g_i2l), unlab), axis=-1)
    fake_img = G64_l2i.apply(c64(state.g_l2i), oh)
    g_adv = (jnp.mean((D64_lab.apply(dp_lab, fake_lab) - 1.0) ** 2)
             + jnp.mean((D64_img.apply(dp_img, fake_img) - 1.0) ** 2))
    d_loss = 0.5 * (
        jnp.mean((D64_img.apply(dp_img, unlab) - 1.0) ** 2)
        + jnp.mean(D64_img.apply(dp_img, fake_img) ** 2)) + 0.5 * (
        jnp.mean((D64_lab.apply(dp_lab, oh) - 1.0) ** 2)
        + jnp.mean(D64_lab.apply(dp_lab, fake_lab) ** 2))
    return d_loss, g_adv


d64_grad = jax.jit(jax.value_and_grad(adv_probe, has_aux=True))
(d_loss64, g_adv64), d_grads64 = d64_grad(
    (c64(state.d_img), c64(state.d_lab)), batches[0])
adv64 = {
    "d_loss64": float(jax.device_get(d_loss64)),
    "g_adv64": float(jax.device_get(g_adv64)),
    "grad_d64": [float(jnp.asarray(x).sum())
                 for x in jax.tree.leaves(jax.device_get(d_grads64))],
}

# Compile first, then barrier, then run — keeps execution-time collective
# arrival skew tiny regardless of per-process compile-time variance.
compiled = step.lower(state, batches[0]).compile()
g = grad_jit(state.g_i2l, batches[0])
gsum = [float(jnp.asarray(x).astype(jnp.float64).sum())
        for x in jax.tree.leaves(jax.device_get(g))]
multihost_utils.sync_global_devices("compiled")
state, m = compiled(state, batches[0])
metrics1 = {k: float(jax.device_get(v)) for k, v in m.items()}
sums = {"grad_g_i2l": gsum, "metrics1": metrics1, "adv64": adv64}
for name, tree in (("g_i2l", state.g_i2l), ("d_img", state.d_img)):
    leaves = jax.tree.leaves(jax.device_get(tree))
    sums[name] = [float(jnp.asarray(x).astype(jnp.float64).sum()) for x in leaves]
print("CHECKSUMS " + json.dumps(sums), flush=True)
""" % {"root": str(ROOT)}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _launch(coord: str, pid: int) -> subprocess.Popen:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=4")
    return subprocess.Popen(
        [sys.executable, "-c", _WORKER, coord, str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)


def _checksums(out: str) -> dict:
    for line in out.splitlines():
        if line.startswith("CHECKSUMS "):
            return json.loads(line[len("CHECKSUMS "):])
    raise AssertionError(f"no CHECKSUMS line in output:\n{out[-4000:]}")


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    coord = f"localhost:{_free_port()}"
    procs = [_launch(coord, 0), _launch(coord, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
            assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    # Single-process 8-device reference run (separate subprocess so the
    # devices/config of the current pytest process stay untouched).
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=8")
    ref = subprocess.run(
        [sys.executable, "-c", _WORKER, "unused", "-1"],
        capture_output=True, text=True, env=env, timeout=900)
    assert ref.returncode == 0, f"reference failed:\n{ref.stdout[-4000:]}"

    ref_sums = _checksums(ref.stdout)
    got = [_checksums(out) for out in outs]
    # (a) the two processes agree bit-for-bit on everything (params after a
    # step, grads, all metrics)
    for name in ("grad_g_i2l", "g_i2l", "d_img"):
        np.testing.assert_array_equal(
            got[0][name], got[1][name],
            err_msg=f"{name} differs between the two worker processes")
    assert got[0]["metrics1"] == got[1]["metrics1"]
    # (b) vs single-process. Probed facts behind the tolerances (round-2
    # debugging): the per-device input shards and initial params are
    # BIT-IDENTICAL across setups (verified via addressable_shards), and the
    # supervised CE + image-cycle losses reproduce exactly. The CE grad
    # matches to psum reduction-order noise. The f32 in-step adversarial
    # metrics carry leaky-relu-amplified scheduling noise on the CPU test
    # backend, so the adversarial/D path is asserted through the FLOAT64
    # probe below (VERDICT r2 item 6): same G applies, D applies on fakes,
    # LSGAN losses and D-parameter grads (psum'd) — in f64 the reduction-
    # order noise is ~1e-16 and the kink amplification excuse is dead.
    np.testing.assert_allclose(
        got[0]["grad_g_i2l"], ref_sums["grad_g_i2l"], rtol=1e-3, atol=1e-6,
        err_msg="global CE grads diverged between 2-process and 1-process")
    for key, tol in (("g_sup", 1e-6), ("g_cycle_img", 1e-6),
                     ("g_cycle_lab", 1e-3)):
        np.testing.assert_allclose(
            got[0]["metrics1"][key], ref_sums["metrics1"][key], rtol=tol,
            err_msg=f"{key} diverged between 2-process and 1-process")
    for key in ("d_loss64", "g_adv64"):
        np.testing.assert_allclose(
            got[0]["adv64"][key], ref_sums["adv64"][key], rtol=1e-9,
            err_msg=f"f64 {key} diverged between 2-process and 1-process")
    np.testing.assert_allclose(
        got[0]["adv64"]["grad_d64"], ref_sums["adv64"]["grad_d64"],
        rtol=1e-7, atol=1e-12,
        err_msg="f64 D-parameter grads diverged between 2- and 1-process")


_RUNNER_WORKER = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
COORD, PID, WORKDIR = sys.argv[1], int(sys.argv[2]), sys.argv[3]
# 1-core CI hosts starve a worker for minutes (Orbax restore, compile);
# the default 100 s heartbeat / 300 s shutdown barrier then kills the run
# as "peer died" even though both workers are healthy.
jax.distributed.initialize(coordinator_address=COORD, num_processes=2,
                           process_id=PID,
                           heartbeat_timeout_seconds=600,
                           shutdown_timeout_seconds=1200)
sys.path.insert(0, %(root)r)
from cyclegan_tpu.utils.cpuflags import pin_cpu_compile_cache
pin_cpu_compile_cache()

from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("gloo-warmup")

import jax.numpy as jnp
from cyclegan_tpu.train.runner import run_cyclegan
from cyclegan_tpu.utils.config import Config

cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4, ndf=4,
             bf16=False, crop_height=24, crop_width=24, batch_size=8,
             pool_size=2, labeled_fraction=0.5, epochs=1, decay_epoch=1,
             dataset_size=16, validation_every=1, log_every=1,
             checkpoint_dir=WORKDIR + "/ckpt", results_dir=WORKDIR + "/res",
             loader="grain")
result = run_cyclegan(cfg, max_steps=2)
print("RUNNER_DONE " + json.dumps({"pid": PID, "val": result}), flush=True)
""" % {"root": str(ROOT)}


_RESUME_WORKER = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
COORD, PID, WORKDIR, EPOCHS = (sys.argv[1], int(sys.argv[2]), sys.argv[3],
                               int(sys.argv[4]))
# 1-core CI hosts starve a worker for minutes (Orbax restore, compile);
# the default 100 s heartbeat / 300 s shutdown barrier then kills the run
# as "peer died" even though both workers are healthy.
jax.distributed.initialize(coordinator_address=COORD, num_processes=2,
                           process_id=PID,
                           heartbeat_timeout_seconds=600,
                           shutdown_timeout_seconds=1200)
sys.path.insert(0, %(root)r)
from cyclegan_tpu.utils.cpuflags import pin_cpu_compile_cache
pin_cpu_compile_cache()

from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("gloo-warmup")

import jax.numpy as jnp
from cyclegan_tpu.train.runner import run_cyclegan
from cyclegan_tpu.train.checkpoint import CheckpointManager
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config

cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4, ndf=4,
             bf16=False, crop_height=24, crop_width=24, batch_size=8,
             pool_size=2, labeled_fraction=0.5, epochs=EPOCHS, decay_epoch=2,
             dataset_size=16, validation_every=EPOCHS, log_every=100,
             checkpoint_dir=WORKDIR + "/ckpt", results_dir=WORKDIR + "/res")
val = run_cyclegan(cfg)
# Checksum the final params straight from the checkpoint (what a later run
# would actually resume from).
tr = CycleGANTrainer(cfg, 21, 3, steps_per_epoch=1)
ckpt = CheckpointManager(cfg.checkpoint_dir)
state, next_epoch = ckpt.restore(tr.init_state(jax.random.PRNGKey(cfg.seed)))
ckpt.close()
sums = [float(jnp.asarray(x).astype(jnp.float64).sum())
        for x in jax.tree.leaves(state.g_i2l) + jax.tree.leaves(state.d_img)]
print("RESUME_DONE " + json.dumps(
    {"pid": PID, "next_epoch": next_epoch, "val": val, "sums": sums}),
    flush=True)
""" % {"root": str(ROOT)}


def _run_resume_workers(coord, tmp_path, epochs):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _RESUME_WORKER, coord, str(pid),
         str(tmp_path), str(epochs)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
            assert p.returncode == 0, f"resume worker failed:\n{out[-5000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    recs = []
    for out in outs:
        line = next(ln for ln in out.splitlines()
                    if ln.startswith("RESUME_DONE "))
        recs.append(json.loads(line[len("RESUME_DONE "):]))
    return recs


@pytest.mark.slow
def test_two_process_checkpoint_resume(tmp_path):
    """Kill-and-relaunch resume across 2 processes (VERDICT r2 item 6): run
    epoch 0, exit; relaunch with epochs=2 (resumes from the epoch-0 Orbax
    checkpoint); final params must be IDENTICAL to an uninterrupted
    2-process epochs=2 run."""
    # interrupted: epoch 0 only, then a fresh pair of processes resumes
    coord = f"localhost:{_free_port()}"
    _run_resume_workers(coord, tmp_path / "interrupted", epochs=1)
    coord = f"localhost:{_free_port()}"
    resumed = _run_resume_workers(coord, tmp_path / "interrupted", epochs=2)
    # uninterrupted reference
    coord = f"localhost:{_free_port()}"
    straight = _run_resume_workers(coord, tmp_path / "straight", epochs=2)

    assert resumed[0]["next_epoch"] == straight[0]["next_epoch"] == 2
    np.testing.assert_array_equal(resumed[0]["sums"], resumed[1]["sums"])
    np.testing.assert_allclose(resumed[0]["sums"], straight[0]["sums"],
                               rtol=1e-7,
                               err_msg="resumed run diverged from the "
                                       "uninterrupted run")


_PREEMPT_WORKER = r"""
import json, os, sys
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
COORD, PID, WORKDIR, EPOCHS, PREEMPT_AT = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4]),
    int(sys.argv[5]))
# Deliberately asymmetric: ONLY worker 0 receives the preemption signal —
# the runner's boundary allgather must stop BOTH workers in lockstep
# (SIGTERM delivery on real pods is per-process and racy).
if PREEMPT_AT and PID == 0:
    os.environ["CYCLEGAN_TPU_PREEMPT_AT_STEP"] = str(PREEMPT_AT)
# 1-core CI hosts starve a worker for minutes (Orbax restore, compile);
# the default 100 s heartbeat / 300 s shutdown barrier then kills the run
# as "peer died" even though both workers are healthy.
jax.distributed.initialize(coordinator_address=COORD, num_processes=2,
                           process_id=PID,
                           heartbeat_timeout_seconds=600,
                           shutdown_timeout_seconds=1200)
sys.path.insert(0, %(root)r)
from cyclegan_tpu.utils.cpuflags import pin_cpu_compile_cache
pin_cpu_compile_cache()

from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("gloo-warmup")

import jax.numpy as jnp
from cyclegan_tpu.train.runner import run_cyclegan
from cyclegan_tpu.train.checkpoint import CheckpointManager
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config

# dataset_size=32 -> 2 optimizer steps/epoch, so step 3 is MID-epoch-1.
cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4, ndf=4,
             bf16=False, crop_height=24, crop_width=24, batch_size=8,
             pool_size=2, labeled_fraction=0.5, epochs=EPOCHS, decay_epoch=2,
             dataset_size=32, validation_every=0, log_every=100,
             save_every_steps=1,
             checkpoint_dir=WORKDIR + "/ckpt", results_dir=WORKDIR + "/res")
val = run_cyclegan(cfg)
tr = CycleGANTrainer(cfg, 21, 3, steps_per_epoch=2)
ckpt = CheckpointManager(cfg.checkpoint_dir)
res = ckpt.restore(tr.init_state(jax.random.PRNGKey(cfg.seed)))
ckpt.close()
state, next_epoch = res if res is not None else (None, -1)
sums = [] if state is None else [
    float(jnp.asarray(x).astype(jnp.float64).sum())
    for x in jax.tree.leaves(state.g_i2l) + jax.tree.leaves(state.d_img)]
print("PREEMPT_DONE " + json.dumps(
    {"pid": PID, "next_epoch": next_epoch,
     "preempted": bool(val.get("preempted", False)), "sums": sums}),
    flush=True)
""" % {"root": str(ROOT)}


def _run_preempt_workers(tmp_path, epochs, preempt_at):
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("CYCLEGAN_TPU_PREEMPT_AT_STEP", None)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _PREEMPT_WORKER, coord, str(pid),
         str(tmp_path), str(epochs), str(preempt_at)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
            assert p.returncode == 0, f"preempt worker failed:\n{out[-5000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    recs = []
    for out in outs:
        line = next(ln for ln in out.splitlines()
                    if ln.startswith("PREEMPT_DONE "))
        recs.append(json.loads(line[len("PREEMPT_DONE "):]))
    return recs


@pytest.mark.slow
def test_two_process_mid_epoch_preempt_resume(tmp_path):
    """Mid-epoch preemption across 2 processes (Config.save_every_steps):
    only worker 0 is signalled at optimizer step 3 (mid-epoch-1); the
    runner's save-boundary allgather must stop BOTH workers together, and
    a relaunched pair must resume at the exact batch position and finish
    identical to an uninterrupted 2-process run."""
    interrupted = _run_preempt_workers(tmp_path / "interrupted", epochs=2,
                                       preempt_at=3)
    assert all(r["preempted"] for r in interrupted), interrupted
    resumed = _run_preempt_workers(tmp_path / "interrupted", epochs=2,
                                   preempt_at=0)
    assert not any(r["preempted"] for r in resumed)
    straight = _run_preempt_workers(tmp_path / "straight", epochs=2,
                                    preempt_at=0)
    assert resumed[0]["next_epoch"] == straight[0]["next_epoch"] == 2
    np.testing.assert_array_equal(resumed[0]["sums"], resumed[1]["sums"])
    np.testing.assert_allclose(
        resumed[0]["sums"], straight[0]["sums"], rtol=1e-7,
        err_msg="preempted+resumed run diverged from the uninterrupted run")


@pytest.mark.slow
def test_two_process_runner_end_to_end(tmp_path):
    """The FULL runner (grain loader with row sharding, sharded train
    step, sharded eval, orbax checkpointing, primary-gated logging) across
    two real processes."""
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=4")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _RUNNER_WORKER, coord, str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
            assert p.returncode == 0, f"runner worker failed:\n{out[-5000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    vals = []
    for out in outs:
        line = next(ln for ln in out.splitlines()
                    if ln.startswith("RUNNER_DONE "))
        vals.append(json.loads(line[len("RUNNER_DONE "):])["val"])
    # both processes computed the same (psum'd) validation metrics
    assert vals[0].keys() == vals[1].keys() and "miou" in vals[0]
    for k in vals[0]:
        np.testing.assert_allclose(vals[0][k], vals[1][k], rtol=1e-5)
    # checkpoint written exactly once (primary host writes)
    ckpts = list((tmp_path / "ckpt").iterdir())
    assert len(ckpts) >= 1


_RAGGED_WORKER = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
COORD, PID, WORKDIR = sys.argv[1], int(sys.argv[2]), sys.argv[3]
jax.distributed.initialize(coordinator_address=COORD, num_processes=2,
                           process_id=PID,
                           heartbeat_timeout_seconds=600,
                           shutdown_timeout_seconds=1200)
sys.path.insert(0, %(root)r)
from cyclegan_tpu.utils.cpuflags import pin_cpu_compile_cache
pin_cpu_compile_cache()

from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("gloo-warmup")

from cyclegan_tpu.train.runner import run_cyclegan
from cyclegan_tpu.utils.config import Config

# 40-image synthetic val split / global batch 6 -> val batches of
# 6,...,6 then a ragged 4 (drop_last=False); both divide the 2-device
# mesh, so the eval program runs at TWO distinct shapes.
cfg = Config(dataset="synthetic", gen_net="resnet_6blocks", ngf=4, ndf=4,
             bf16=False, crop_height=24, crop_width=24, batch_size=6,
             pool_size=2, labeled_fraction=0.5, epochs=1, decay_epoch=1,
             dataset_size=16, validation_every=1, log_every=100,
             checkpoint_dir=WORKDIR + "/ckpt", results_dir=WORKDIR + "/res")
val = run_cyclegan(cfg)
print("RAGGED_DONE " + json.dumps({"pid": PID, "val": val}), flush=True)
""" % {"root": str(ROOT)}


@pytest.mark.slow
def test_two_process_ragged_val_batches(tmp_path):
    """Multi-process eval where the final val batch is a different shape
    (drop_last=False): the per-shape _aligned_jit cache must AOT-compile
    and barrier for EACH shape instead of feeding a fixed-shape compiled
    executable (r3 review finding 2)."""
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                        " --xla_force_host_platform_device_count=1")
    procs = [subprocess.Popen(
        [sys.executable, "-c", _RAGGED_WORKER, coord, str(pid), str(tmp_path)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=1200)
            outs.append(out)
            assert p.returncode == 0, f"ragged worker failed:\n{out[-5000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    vals = []
    for out in outs:
        line = next(ln for ln in out.splitlines()
                    if ln.startswith("RAGGED_DONE "))
        vals.append(json.loads(line[len("RAGGED_DONE "):])["val"])
    assert "miou" in vals[0]
    for k in vals[0]:
        np.testing.assert_allclose(vals[0][k], vals[1][k], rtol=1e-5)
