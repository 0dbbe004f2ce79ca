"""Model zoo exports (reference ``models/__init__.py:1-10`` parity).

Uniform contract (channels-last): ``__call__(x: (B, T, H, W, C)) ->
(B, T', H, W, C)``; TANTE-adaptive ``__call__(x, out_T) -> (y, r_t)``;
CViT ``__call__(x, coords) -> (B, T', N, C)``.
"""

from tante_tpu.models.tante import TANTE, Interprator
from tante_tpu.models.attn_backbone import AttnBackbone
from tante_tpu.models.enc_dec_cnn import DecCNN, EncCNN
from tante_tpu.models.enc_dec_fno import DecFNO, EncFNO

# Baseline zoo models are imported lazily below as they are implemented;
# missing names simply don't register (registry.py skips them).
try:
    from tante_tpu.models.fno import FNO
except ImportError:  # pragma: no cover
    pass
try:
    from tante_tpu.models.tfno import TFNO
except ImportError:  # pragma: no cover
    pass
try:
    from tante_tpu.models.afno import AFNO
except ImportError:  # pragma: no cover
    pass
try:
    from tante_tpu.models.uno import UNO
except ImportError:  # pragma: no cover
    pass
try:
    from tante_tpu.models.dpot import DPOT
except ImportError:  # pragma: no cover
    pass
try:
    from tante_tpu.models.avit import AViT
except ImportError:  # pragma: no cover
    pass
try:
    from tante_tpu.models.cvit import CViT
except ImportError:  # pragma: no cover
    pass
try:
    from tante_tpu.models.unet_convnext import UNetConvNext
except ImportError:  # pragma: no cover
    pass
try:
    from tante_tpu.models.unet_att import AttentionUNet
except ImportError:  # pragma: no cover
    pass
