"""Demo: write scalar/histogram/audio summaries to tb_logs/ (reference:
examples/train_with_tensorboard.py), then view them through the server's
/apis/v1/tensorboard proxy."""
import math
import os

import numpy as np


def main():
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        from tensorboardX import SummaryWriter

    from easevoice_trainer_tpu.utils import paths

    logdir = os.path.join(paths.tb_log_dir(), "example")
    writer = SummaryWriter(logdir)
    rng = np.random.default_rng(0)
    for step in range(100):
        writer.add_scalar("loss/total", 2.0 * math.exp(-step / 30.0)
                          + rng.normal(0, 0.02), step)
        writer.add_scalar("lr", 1e-4 * (0.999875 ** step), step)
        if step % 20 == 0:
            writer.add_histogram("weights/example",
                                 rng.normal(0, 1.0 / (1 + step), 512), step)
    sr = 32000
    t = np.arange(sr) / sr
    writer.add_audio("audio/sine", np.sin(2 * np.pi * 440 * t)[None, :], 0,
                     sample_rate=sr)
    writer.add_text("notes", "easevoice_trainer_tpu tensorboard demo", 0)
    writer.close()
    print(f"wrote summaries to {logdir}; run the server and open "
          "/apis/v1/tensorboard/")


if __name__ == "__main__":
    main()
