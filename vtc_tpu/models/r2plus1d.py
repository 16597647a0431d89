"""R(2+1)D-34 video backbone (the reference's ``R2Plus1D_34_IG65M_32frames``
wrapper around the ig65m torch.hub model, ``model/model.py:626-661``).

Factorized 3-D convolutions: every 3x3x3 conv becomes a (1,3,3) spatial conv
-> BN -> ReLU -> (3,1,1) temporal conv with an intermediate width chosen to
keep the parameter count of the full 3-D conv (the R(2+1)D paper's M_i rule,
matching torchvision's ``Conv2Plus1D``). Layout is channels-last on TPU
(NDHWC) so XLA tiles the convs onto the MXU; the public ``__call__`` accepts
the reference's [b, c, t, h, w] and returns pooled [b, 512] features with
configurable spatial/temporal pooling (mean/max).

``import_ig65m_weights`` maps a torchvision/ig65m ``r2plus1d_34`` state_dict
onto these params for checkpoint parity.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import TorchBatchNorm


def _midplanes(cin: int, cout: int) -> int:
    # torchvision BasicBlock: keep ~the 3x3x3 parameter budget. Computed
    # ONCE per block from (inplanes, planes) and reused by BOTH convs —
    # conv2 of a transition block does NOT recompute it from its own
    # (planes, planes) input.
    return (cin * cout * 3 * 3 * 3) // (cin * 3 * 3 + 3 * cout)


class Conv2Plus1D(nn.Module):
    cout: int
    midplanes: int
    stride: tuple = (1, 1, 1)  # (t, h, w)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = self.midplanes
        st, sh, sw = self.stride
        x = nn.Conv(
            mid, (1, 3, 3), strides=(1, sh, sw), padding=(0, 1, 1),
            use_bias=False, dtype=self.dtype, name="conv_s",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="bn_s",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            self.cout, (3, 1, 1), strides=(st, 1, 1), padding=(1, 0, 0),
            use_bias=False, dtype=self.dtype, name="conv_t",
        )(x)
        return x


class R2Plus1dBlock(nn.Module):
    cout: int
    stride: tuple = (1, 1, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        mid = _midplanes(x.shape[-1], self.cout)  # shared by conv1 AND conv2
        y = Conv2Plus1D(
            self.cout, mid, self.stride, dtype=self.dtype, name="conv1"
        )(x, train)
        y = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="bn1",
        )(y)
        y = nn.relu(y)
        y = Conv2Plus1D(self.cout, mid, dtype=self.dtype, name="conv2")(y, train)
        y = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="bn2",
        )(y)
        if self.stride != (1, 1, 1) or x.shape[-1] != self.cout:
            identity = nn.Conv(
                self.cout, (1, 1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = TorchBatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype,
                name="downsample_bn",
            )(identity)
        return nn.relu(y + identity)


class R2Plus1D_34_IG65M_32frames(nn.Module):
    """[b, 3, t, h, w] -> [b, 512] with spatial then temporal pooling
    (``model/model.py:637-661``)."""

    pool_spatial: str = "mean"
    pool_temporal: str = "mean"
    dtype: jnp.dtype = jnp.float32

    LAYERS = (3, 4, 6, 3)
    WIDTHS = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = jnp.moveaxis(x.astype(self.dtype), 1, -1)  # -> [b, t, h, w, c]

        # R2Plus1dStem: (1,7,7)/s(1,2,2) then (3,1,1)
        x = nn.Conv(
            45, (1, 7, 7), strides=(1, 2, 2), padding=(0, 3, 3),
            use_bias=False, dtype=self.dtype, name="stem_conv_s",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="stem_bn_s",
        )(x)
        x = nn.relu(x)
        x = nn.Conv(
            64, (3, 1, 1), padding=(1, 0, 0), use_bias=False,
            dtype=self.dtype, name="stem_conv_t",
        )(x)
        x = TorchBatchNorm(
            use_running_average=not train, momentum=0.9, dtype=self.dtype,
            name="stem_bn_t",
        )(x)
        x = nn.relu(x)

        for li, (n, w) in enumerate(zip(self.LAYERS, self.WIDTHS)):
            for bi in range(n):
                stride = (2, 2, 2) if (li > 0 and bi == 0) else (1, 1, 1)
                x = R2Plus1dBlock(
                    w, stride, dtype=self.dtype, name=f"layer{li + 1}_{bi}"
                )(x, train)

        # -> [b, c, t] then pool (einops Reduce semantics)
        x = x.astype(jnp.float32)
        sp = jnp.mean if self.pool_spatial == "mean" else jnp.max
        tp = jnp.mean if self.pool_temporal == "mean" else jnp.max
        x = sp(x, axis=(2, 3))  # [b, t, c]
        x = tp(x, axis=1)  # [b, c]
        return x


def import_ig65m_weights(state_dict) -> dict:
    """torchvision/ig65m ``r2plus1d_34`` state_dict -> params/batch_stats.

    torch keys: stem.{0,1,3,4}, layerN.M.conv1.0.{0,1,3}, layerN.M.bn1, ...
    Conv3d OIDHW -> flax DHWIO.
    """

    def _np(t):
        return np.asarray(
            t.detach().cpu().numpy() if hasattr(t, "detach") else t, np.float32
        )

    def conv(key):
        return _np(state_dict[key]).transpose(2, 3, 4, 1, 0)

    def bn(prefix):
        return (
            {"scale": _np(state_dict[f"{prefix}.weight"]),
             "bias": _np(state_dict[f"{prefix}.bias"])},
            {"mean": _np(state_dict[f"{prefix}.running_mean"]),
             "var": _np(state_dict[f"{prefix}.running_var"])},
        )

    params, stats = {}, {}
    params["stem_conv_s"] = {"kernel": conv("stem.0.weight")}
    params["stem_bn_s"], stats["stem_bn_s"] = bn("stem.1")
    params["stem_conv_t"] = {"kernel": conv("stem.3.weight")}
    params["stem_bn_t"], stats["stem_bn_t"] = bn("stem.4")

    for li, n in enumerate(R2Plus1D_34_IG65M_32frames.LAYERS):
        for bi in range(n):
            t = f"layer{li + 1}.{bi}"
            name = f"layer{li + 1}_{bi}"
            p, s = {}, {}
            for ci in ("conv1", "conv2"):
                p[ci] = {
                    "conv_s": {"kernel": conv(f"{t}.{ci}.0.0.weight")},
                    "conv_t": {"kernel": conv(f"{t}.{ci}.0.3.weight")},
                }
                bn_p, bn_s = bn(f"{t}.{ci}.0.1")
                p[ci]["bn_s"] = bn_p
                s[ci] = {"bn_s": bn_s}
            # the post-conv_builder BatchNorms live INSIDE the outer torch
            # Sequentials (BasicBlock: conv1 = Sequential(Conv2Plus1D, BN,
            # ReLU), conv2 = Sequential(Conv2Plus1D, BN)) — there are no
            # bare "{t}.bn1"/"{t}.bn2" keys in a torchvision/ig65m
            # state_dict
            p["bn1"], s["bn1"] = bn(f"{t}.conv1.1")
            p["bn2"], s["bn2"] = bn(f"{t}.conv2.1")
            if f"{t}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = {"kernel": conv(f"{t}.downsample.0.weight")}
                p["downsample_bn"], s["downsample_bn"] = bn(f"{t}.downsample.1")
            params[name] = p
            stats[name] = s
    return {"params": params, "batch_stats": stats}
