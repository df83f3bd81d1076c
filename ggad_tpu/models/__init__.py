from ggad_tpu.models.ggad import GGAD, GGADOutput

__all__ = ["GGAD", "GGADOutput"]
