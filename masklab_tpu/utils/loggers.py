"""Training observability: CSV, TensorBoard, and optional MLflow sinks.

Covers the reference's logging surface (SURVEY.md §5): CSVLogger (used in
notebooks), the TensorBoard callback (engine/train.py:71), and MLflow
params/metrics in the project driver (road_project/train.py:5,71-87). Each
sink degrades to a no-op when its backend is unavailable.
"""
from __future__ import annotations

import csv
import json
import os
from typing import Dict, Optional


class CSVLogger:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._writer = None
        self._file = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        row = {'step': step, **{k: float(v) for k, v in metrics.items()}}
        if self._writer is None:
            self._file = open(self.path, 'w', newline='')
            self._writer = csv.DictWriter(self._file,
                                          fieldnames=list(row))
            self._writer.writeheader()
        self._writer.writerow(row)
        self._file.flush()

    def close(self):
        if self._file:
            self._file.close()


class TensorBoardLogger:
    """tf.summary-based scalar writer (TensorBoard callback equivalent)."""

    def __init__(self, log_dir: str):
        self._writer = None
        try:
            import tensorflow as tf  # noqa: PLC0415
            self._tf = tf
            self._writer = tf.summary.create_file_writer(log_dir)
        except Exception:
            self._tf = None

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            for k, v in metrics.items():
                self._tf.summary.scalar(k, float(v), step=step)
        self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()


class MLflowLogger:
    """Optional MLflow sink (the reference's driver logged params/metrics/
    artifacts — road_project/train.py:68-87). No-op if mlflow is absent."""

    def __init__(self, run_name: Optional[str] = None):
        try:
            import mlflow  # noqa: PLC0415
            self._mlflow = mlflow
            mlflow.start_run(run_name=run_name)
        except Exception:
            self._mlflow = None

    def log_params(self, params: Dict) -> None:
        if self._mlflow:
            for k, v in params.items():
                self._mlflow.log_param(k, v)

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        if self._mlflow:
            for k, v in metrics.items():
                self._mlflow.log_metric(k, float(v), step=step)

    def log_artifact(self, path: str) -> None:
        if self._mlflow:
            self._mlflow.log_artifact(path)

    def log_artifact_dir(self, path: str, name: Optional[str] = None) -> None:
        """A whole directory (an orbax checkpoint — the reference logged
        the best h5 weights file, road_project/train.py:86-87)."""
        if self._mlflow:
            self._mlflow.log_artifacts(path, artifact_path=name)

    def close(self):
        if self._mlflow:
            self._mlflow.end_run()


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = [l for l in loggers if l is not None]

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        for l in self.loggers:
            l.log(step, metrics)

    def close(self):
        for l in self.loggers:
            l.close()
