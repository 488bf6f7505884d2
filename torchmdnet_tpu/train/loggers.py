"""Metrics loggers: CSV (always), optional W&B and TensorBoard.

Equivalent of the reference's logger wiring (scripts/train.py:153-169).
Optional backends are gated on import availability (no hard deps).
"""

import csv
import os
from typing import Dict


class CSVLogger:
    def __init__(self, log_dir):
        self.path = os.path.join(log_dir, "metrics.csv")
        self._fieldnames = None

    def log_metrics(self, metrics: Dict[str, float], step: int = 0):
        metrics = dict(metrics)
        metrics["step"] = step
        write_header = self._fieldnames is None or not os.path.exists(self.path)
        if self._fieldnames is None:
            self._fieldnames = sorted(metrics.keys())
        # tolerate new keys by rewriting the header set on first occurrence
        extra = set(metrics) - set(self._fieldnames)
        if extra:
            self._fieldnames = sorted(set(self._fieldnames) | extra)
            write_header = True
        mode = "a" if os.path.exists(self.path) and not write_header else "a"
        with open(self.path, mode, newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
            if write_header:
                writer.writeheader()
            writer.writerow(metrics)


class WandbLogger:
    def __init__(self, project, name, save_dir, resume_id=None):
        import wandb

        self.run = wandb.init(
            project=project,
            name=name,
            dir=save_dir,
            resume="must" if resume_id else None,
            id=resume_id,
        )

    def log_metrics(self, metrics, step=0):
        self.run.log(metrics, step=step)


class TensorBoardLogger:
    def __init__(self, log_dir):
        from torch.utils.tensorboard import SummaryWriter

        self.writer = SummaryWriter(os.path.join(log_dir, "tensorboard"))

    def log_metrics(self, metrics, step=0):
        for k, v in metrics.items():
            self.writer.add_scalar(k, v, step)


def make_loggers(hparams, log_dir):
    loggers = [CSVLogger(log_dir)]
    if hparams.get("wandb_use"):
        try:
            loggers.append(
                WandbLogger(
                    hparams.get("wandb_project", "training_"),
                    hparams.get("wandb_name", "training"),
                    log_dir,
                    hparams.get("wandb_resume_from_id"),
                )
            )
        except Exception as e:  # wandb not installed / offline
            print(f"W&B logger unavailable: {e}")
    if hparams.get("tensorboard_use"):
        try:
            loggers.append(TensorBoardLogger(log_dir))
        except Exception as e:
            print(f"TensorBoard logger unavailable: {e}")
    return loggers
