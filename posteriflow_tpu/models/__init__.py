"""Model layer: encoders, flows, NPE (reference: src/ahsd/models/)."""

from posteriflow_tpu.models.encoder import (AttentionPool, CoherentEncoder,
                                            ConvStem, LeanStrainEncoder,
                                            TransformerBlock)
from posteriflow_tpu.models.flow import Conditioner, CouplingNSF
from posteriflow_tpu.models.npe import LeanNPE, NPEConfig

__all__ = ["LeanNPE", "NPEConfig", "CouplingNSF", "Conditioner",
           "LeanStrainEncoder", "CoherentEncoder", "ConvStem",
           "TransformerBlock", "AttentionPool"]
