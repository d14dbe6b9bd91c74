from segma_tpu.structs.interval import Interval, Intervals

__all__ = ["Interval", "Intervals"]
