from .attention_necks import NASFPN, SSH, DyHead, SSHContextModule
from .dilated_encoder import DilatedEncoder
from .extra_necks import PAFPN, ChannelMapper
from .fpg import FPG
from .fpn import FPN
from .pyramid_extras import BFP, FPNCARAFE, HRFPN

__all__ = [
    'FPN', 'PAFPN', 'ChannelMapper', 'BFP', 'HRFPN', 'FPNCARAFE',
    'DilatedEncoder', 'FPG', 'DyHead', 'NASFPN', 'SSH', 'SSHContextModule',
]
