"""Stacked-hourglass backbone.  [SURVEY.md C5; paper's backbone family]

A fully-convolutional encoder–decoder producing stride-4 features, with
optional intermediate stacks (CornerNet-style intermediate supervision: each
stack gets its own prediction heads during training; inference reads the
last).  Recursion depth and widths are static config — XLA sees one fused
graph, no dynamic control flow.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from kgtpu.models.blocks import ConvBlock, Residual, upsample2x


class HourglassModule(nn.Module):
    """One recursive hourglass: down → recurse → up, with skip connections.

    `slim_top` > 0 replaces the skip-path Residual with identity at the
    top `slim_top` resolution levels (the "hourglass_fast" variant).  The
    skip Residual at the full-stride-4 resolution is the single most
    expensive block in the network — 2 of the ~4 full-res-equivalent convs
    per hourglass — while the high-res detail it carries is also available
    through the identity path itself; cutting it targets the round-3
    roofline finding that the backbone ran at ~43% of its HBM bound and
    dominated e2e time (BASELINE.md)."""

    depth: int
    features: int
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    slim_top: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.slim_top > 0:
            up1 = x
        else:
            up1 = Residual(self.features, norm=self.norm,
                           dtype=self.dtype)(x, train)
        low = nn.max_pool(x, (2, 2), strides=(2, 2))
        low = Residual(self.features, norm=self.norm, dtype=self.dtype)(low, train)
        if self.depth > 1:
            low = HourglassModule(self.depth - 1, self.features, self.norm,
                                  self.dtype,
                                  slim_top=max(self.slim_top - 1, 0))(low, train)
        else:
            low = Residual(self.features, norm=self.norm,
                           dtype=self.dtype)(low, train)
        low = Residual(self.features, norm=self.norm, dtype=self.dtype)(low, train)
        return up1 + upsample2x(low)


class HourglassBackbone(nn.Module):
    """Stem (stride 4) + `num_stacks` hourglasses.

    Returns a list of per-stack stride-4 feature maps, one per stack.
    """

    num_stacks: int = 2
    features: int = 128
    depth: int = 4
    norm: str = "group"
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    slim_top: int = 0          # identity skip at the top N levels ("_fast")

    @nn.compact
    def __call__(self, x, train: bool = False, head_fns=None):
        """head_fns: optional list of per-stack head modules (owned by the
        parent KGNet).  When given, each stack's predictions are computed
        HERE and re-injected into the next stack's input (CornerNet-style
        prediction feedback), and the per-stack prediction dicts are
        returned alongside the features so the parent does not re-run the
        heads.  The injection convs only exist in this mode, so the default
        param tree is unchanged."""
        x = ConvBlock(self.features // 2, kernel=7, stride=2, norm=self.norm,
                      dtype=self.dtype)(x, train)
        x = Residual(self.features, stride=2, norm=self.norm,
                     dtype=self.dtype)(x, train)

        # remat each hourglass: activations recomputed in backward, cutting
        # peak HBM roughly per-stack (the jax.checkpoint memory/FLOPs trade).
        # Explicit names keep the param tree identical to the plain variant,
        # so remat on/off checkpoints stay interchangeable.
        hg_cls = (nn.remat(HourglassModule, static_argnums=(2,))
                  if self.remat else HourglassModule)

        outs, preds = [], []
        for i in range(self.num_stacks):
            hg = hg_cls(self.depth, self.features, self.norm,
                        self.dtype, slim_top=self.slim_top,
                        name=f"HourglassModule_{i}")(x, train)
            feat = ConvBlock(self.features, 3, norm=self.norm,
                             dtype=self.dtype)(hg, train)
            outs.append(feat)
            p = head_fns[i](feat) if head_fns is not None else None
            preds.append(p)
            if i < self.num_stacks - 1:
                # inter-stack fusion: project both and re-enter
                fuse = (
                    nn.Conv(self.features, (1, 1), use_bias=False,
                            dtype=self.dtype)(x)
                    + nn.Conv(self.features, (1, 1), use_bias=False,
                              dtype=self.dtype)(feat)
                )
                if p is not None:
                    # prediction feedback: project this stack's raw head
                    # logits back into feature space so the next stack can
                    # correct them rather than re-derive from scratch
                    pcat = jnp.concatenate(
                        [p[k] for k in sorted(p)], axis=-1).astype(self.dtype)
                    fuse = fuse + nn.Conv(
                        self.features, (1, 1), use_bias=False,
                        dtype=self.dtype, name=f"inject_{i}")(pcat)
                x = nn.relu(fuse)
        if head_fns is not None:
            return outs, preds
        return outs
