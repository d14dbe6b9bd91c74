from segma_tpu.models.wavlm.builders import build_wavlm_model

__all__ = ["build_wavlm_model"]
