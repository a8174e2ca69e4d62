"""Evaluation harnesses."""
from .miou import evaluate_dataset

__all__ = ['evaluate_dataset']
