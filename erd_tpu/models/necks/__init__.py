from typing import Any

import flax.linen as nn

from .attention_necks import NASFPN, SSH, DyHead, SSHContextModule
from .dilated_encoder import DilatedEncoder
from .extra_necks import PAFPN, ChannelMapper
from .fpg import FPG
from .fpn import FPN
from .pyramid_extras import BFP, FPNCARAFE, HRFPN

#: Config-reachable necks (mirrors the reference's `neck=dict(type=...)`
#: dispatch through MODELS.build; mmdet names kept, e.g. 'FPN_CARAFE').
SWAPPABLE_NECKS = {
    'FPN': FPN, 'PAFPN': PAFPN, 'BFP': BFP, 'HRFPN': HRFPN,
    'FPN_CARAFE': FPNCARAFE, 'NASFPN': NASFPN, 'NASFCOS_FPN': NASFPN,
    'FPG': FPG, 'DyHead': DyHead, 'SSH': SSH,
    'ChannelMapper': ChannelMapper, 'DilatedEncoder': DilatedEncoder,
}


def neck_spec_to_static(spec):
    """dict or [dict, ...] config -> hashable nested tuple usable as an
    nn.Module field. A list chains necks left-to-right (mmdet's list-form
    ``neck=[FPN, DyHead]`` in configs/dyhead)."""
    if isinstance(spec, dict):
        spec = [spec]
    out = []
    for s in spec:
        items = []
        for k in sorted(s):
            v = s[k]
            if isinstance(v, (list, tuple)):
                v = tuple(tuple(x) if isinstance(x, (list, tuple)) else x
                          for x in v)
            items.append((k, v))
        out.append(tuple(items))
    return tuple(out)


class NeckChain(nn.Module):
    """Swappable neck(s) over the backbone pyramid.

    ``spec`` is the static form from :func:`neck_spec_to_static`. Necks
    whose class has no ``start_level`` field get the input pyramid
    pre-sliced by the spec's ``start_level`` (e.g. NASFPN consumes C3-C5);
    ``in_channels`` is derived from the incoming features when the class
    wants it and the spec doesn't pin it.
    """
    spec: Any

    @nn.compact
    def __call__(self, feats):
        feats = tuple(feats)
        for i, item in enumerate(self.spec):
            kw = dict(item)
            cls = SWAPPABLE_NECKS[kw.pop('type')]
            fields = cls.__dataclass_fields__
            if 'start_level' not in fields:
                start = int(kw.pop('start_level', 0))
                if start:
                    feats = feats[start:]
            if 'in_channels' in fields and 'in_channels' not in kw:
                kw['in_channels'] = tuple(f.shape[-1] for f in feats)
            feats = cls(name=f'chain{i}', **kw)(feats)
        return tuple(feats)


__all__ = [
    'FPN', 'PAFPN', 'ChannelMapper', 'BFP', 'HRFPN', 'FPNCARAFE',
    'DilatedEncoder', 'FPG', 'DyHead', 'NASFPN', 'SSH', 'SSHContextModule',
    'SWAPPABLE_NECKS', 'neck_spec_to_static', 'NeckChain',
]
