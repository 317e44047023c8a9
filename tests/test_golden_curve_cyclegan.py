"""Semi-sup CycleGAN golden loss-curve regression (VERDICT.md round-1 weak
item 7): a fixed-seed semi-supervised run must reproduce the committed
trajectory. Locks the full G/D dynamics — init, pairing, pool replay PRNG,
all five G losses, both D losses, optimizer and schedule — against drift the
3-step torch-parity test can't see.

Regenerate after an INTENTIONAL semantics change with:
  python tests/test_golden_curve_cyclegan.py
"""

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from cyclegan_tpu.data.datasets import make_dataset, split_labeled
from cyclegan_tpu.data.loader import Loader, paired_iterator
from cyclegan_tpu.train.cyclegan import CycleGANTrainer
from cyclegan_tpu.utils.config import Config

GOLDEN_PATH = Path(__file__).parent / "golden" / "cyclegan_losses.json"
TRACKED = ("g_total", "g_adv", "g_cycle_img", "g_cycle_lab", "g_sup", "d_total")


def _run_curve() -> dict:
    cfg = Config(gen_net="resnet_6blocks", ngf=8, ndf=8, bf16=False,
                 crop_height=32, crop_width=32, batch_size=2,
                 epochs=100, decay_epoch=50, pool_size=4,
                 labeled_fraction=0.25)
    ds = make_dataset("synthetic", size=16)
    lab_ds, unlab_ds = split_labeled(ds, cfg.labeled_fraction, seed=0)
    lab_l = Loader(lab_ds, batch_size=2, crop_hw=(32, 32), train=True, seed=0)
    unlab_l = Loader(unlab_ds, batch_size=2, crop_hw=(32, 32), train=True, seed=1)
    tr = CycleGANTrainer(cfg, 21, 3, steps_per_epoch=2)
    state = tr.init_state(jax.random.PRNGKey(0))
    step = jax.jit(tr.train_step, donate_argnums=0)
    curve: dict = {k: [] for k in TRACKED}
    for e in range(3):
        for lab_b, unlab_b in paired_iterator(lab_l, unlab_l, e, mode="zip"):
            state, m = step(state, {
                "lab_image": jnp.asarray(lab_b["image"]),
                "lab_label": jnp.asarray(lab_b["label"]),
                "unlab_image": jnp.asarray(unlab_b["image"]),
            })
            for k in TRACKED:
                curve[k].append(round(float(m[k]), 6))
    return curve


def test_cyclegan_curve_matches_golden():
    golden = json.loads(GOLDEN_PATH.read_text())
    curve = _run_curve()
    for k in TRACKED:
        np.testing.assert_allclose(
            curve[k], golden["losses"][k], rtol=3e-4, atol=1e-5,
            err_msg=f"loss {k!r} drifted from the committed trajectory")


if __name__ == "__main__":
    # Mirror tests/conftest.py exactly — the golden numbers depend on it.
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_default_matmul_precision", "highest")
    from cyclegan_tpu.utils.cpuflags import pin_cpu_compile_cache

    pin_cpu_compile_cache()
    curve = _run_curve()
    GOLDEN_PATH.write_text(json.dumps({
        "config": ("resnet_6blocks ngf=ndf=8 fp32 32x32 batch=2 synthetic(16) "
                   "labeled_fraction=0.25 pool=4 pairing=zip seed=0 3 epochs"),
        "losses": curve,
    }, indent=1))
    print(f"wrote {GOLDEN_PATH}")
