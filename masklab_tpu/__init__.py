"""masklab_tpu — TPU-native joint instance + semantic segmentation framework.

A ground-up JAX / XLA / Pallas / pjit re-design with the capabilities of
``craftsangjae/instance-segmentation-road-project`` (the "MaskLab" engine:
RetinaMask single-shot detection + per-RoI mask heads joined with a DeepLab
V3+ semantic head over a shared backbone zoo), plus the surrounding
framework: config/CLI, data pipeline, multi-phase training over a TPU mesh,
checkpointing, end-to-end jitted inference with in-graph postprocessing,
serving, and evaluation.

See SURVEY.md for the structural analysis of the reference this rebuilds.
"""
from .config import ModelConfiguration
from .prior import PriorBoxes, generate_priors, priors_from_config

__version__ = '0.1.0'

__all__ = ['ModelConfiguration', 'PriorBoxes', 'generate_priors',
           'priors_from_config', '__version__']
