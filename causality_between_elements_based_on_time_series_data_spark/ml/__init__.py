from .amtl import AMTLConfig, AMTLTrainer
from .retain import retain_entity_features

__all__ = ["AMTLConfig", "AMTLTrainer", "retain_entity_features"]
