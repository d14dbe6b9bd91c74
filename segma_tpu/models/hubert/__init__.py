from segma_tpu.models.hubert.builders import build_hubert_model

__all__ = ["build_hubert_model"]
