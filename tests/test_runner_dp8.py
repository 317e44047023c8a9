"""Full runner on an 8-virtual-device DP mesh (config-5 analog in CI):
training, sharded validation, checkpointing and sample dumps all through
runner.run_cyclegan."""

import glob
import os

from cyclegan_tpu.train import runner
from cyclegan_tpu.utils.config import Config


def test_run_cyclegan_dp8(tmp_path):
    cfg = Config(
        dataset="synthetic", dataset_size=32, gen_net="resnet_6blocks",
        ngf=8, ndf=8, crop_height=32, crop_width=32, batch_size=8,
        labeled_fraction=0.25, pool_size=4, bf16=True,
        epochs=1, decay_epoch=0, log_every=1, num_devices=8,
        checkpoint_dir=str(tmp_path / "ck"), results_dir=str(tmp_path / "res"),
    )
    result = runner.run_cyclegan(cfg, max_steps=2)
    assert "miou" in result and 0.0 <= result["miou"] <= 1.0
    # checkpoint written
    assert os.path.isdir(tmp_path / "ck")
    # metrics log + sample dumps
    assert (tmp_path / "res" / "train_metrics.jsonl").exists()
    assert glob.glob(str(tmp_path / "res" / "epoch0_sample*_pred.png"))
    # resume path: second invocation restores and runs one more step
    result2 = runner.run_cyclegan(cfg.replace(epochs=2), max_steps=1)
    assert "miou" in result2
