"""Case setup: boundaries, neighbor search, features, targets, integration."""

from .case import CaseSetupFn, case_builder
from .features import FeatureDict, TargetDict, physical_feature_builder

__all__ = [
    "case_builder",
    "CaseSetupFn",
    "physical_feature_builder",
    "FeatureDict",
    "TargetDict",
]
