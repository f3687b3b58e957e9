"""TransformerCVN: the full event + prong classification network.

Re-design of the reference's live model stack (neutrino_full_base_network.py:
17-188 plus the dense/sdxl/sparse subclasses): two pixel-CNN embedders (event
and prong), a feature-embedding MLP, learned type position embeddings, a
shared combined LinearBlock, the masked transformer encoder, and the two
classification heads.  The reference's trainer-subclass-per-architecture
hierarchy becomes a registry keyed by ``ModelConfig.embedder``.

TPU-first specifics:

* pixel preprocessing + COO->dense scatter happen inside the jitted graph
  (static shapes, drop-mode padding) instead of a host-side collate;
* prong CNN work runs on the *packed* slot axis only (real prongs), exactly
  like the reference's masked_pack trick, but with bucketed static sizes;
* everything is NHWC / bfloat16-friendly; logits are returned in float32.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.scatter import densify_images, pack_rows, pad_rows
from .blocks import FeatureEmbedding, LinearBlock, make_divisible
from .densenet import DenseNet
from .encoder import TransformerEncoder
from .heads import EventDecoder, ProngDecoder


@dataclass(frozen=True)
class ModelConfig:
    # architecture
    hidden_dim: int = 128
    initial_feature_dim: int = 32
    initial_pixel_dim: int = 16
    feature_embedding_dim: int = 8
    pixel_embedding_dim: int = 512
    position_embedding_dim: int = 16
    num_embedding_layers: int = 100
    num_encoder_layers: int = 5
    num_prong_decoder_layers: int = 4
    num_attention_heads: int = 8
    transformer_activation: str = "gelu"
    transformer_norm_first: bool = False
    linear_prelu_activation: bool = True
    linear_batch_norm: bool = True
    disable_smart_features: bool = False
    one_hot_pixels: bool = False
    log_pixels: bool = False
    densenet_structure: Tuple[int, ...] = (6, 12, 24, 16)
    densenet_growth_rate: int = 16
    densenet_batch_norm_size: int = 4
    mobilenet_structure: Optional[Tuple[Tuple[int, ...], ...]] = None
    dropout: float = 0.0
    pixel_noise_std: float = 0.01
    # data dims
    features_dim: int = 6
    extra_dim: int = 4
    pixel_channels: int = 3
    image_height: int = 400
    image_width: int = 280
    max_prongs: int = 20
    num_event_classes: int = 4
    num_prong_classes: int = 8
    # Split-event-targets variant: extra generation/mode classes appended to
    # the event head (two linear heads on one token == one wider linear head).
    num_generation_classes: int = 0
    # ClassifierProng variant: decode the event class from a learned token
    # prepended ahead of the event-image token (neutrino_combined_network.py:
    # 104-121).
    learned_classifier_token: bool = False
    # embedder family: 'dense' | 'coo' | 'sdxl' | 'sparse' | 'mobilenet'
    # | 'resnet' | 'convnext' | 'fcnn'
    embedder: str = "dense"
    # execution
    compute_dtype: str = "bfloat16"
    axis_name: Optional[str] = None
    remat_cnn: bool = False
    remat_embedder: bool = False
    # Apply the pixel embedders over the bank in sequential chunks of this
    # many rows (nn.scan + per-chunk remat); 0 = off.  SDXL-only: GroupNorm
    # is per-sample so chunking is exact, while the BatchNorm families need
    # bank-wide statistics.  See Options.embedder_chunk.
    embedder_chunk: int = 0
    # Selective remat in the chunk body: save tagged conv outputs with
    # spatial extent <= this across the scan (0 = blanket remat).  See
    # Options.embedder_chunk_save_spatial.
    embedder_chunk_save_spatial: int = 0
    # Dense family: compute the 7x7/2 stem conv as a 4x4/1 conv over the
    # 2x2 space-to-depth input — same parameters, same map, better MXU
    # tiling (see models.densenet.SpaceToDepthStem).
    stem_space_to_depth: bool = False
    # Dense/coo transitions pool before the 1x1 conv (linear commute; see
    # models.densenet.Transition.pool_first).
    transition_pool_first: bool = False
    # Reference quirk (neutrino_full_base_network.py:107): prongs reuse the
    # *event* position embedding; set True to use the dedicated prong vector.
    fix_prong_position_embedding: bool = False

    @classmethod
    def from_options(
        cls,
        options,
        features_dim: int,
        extra_dim: int,
        pixel_channels: int,
        num_event_classes: int,
        num_prong_classes: int,
        image_shape: Tuple[int, int] = (400, 280),
        embedder: str = "dense",
        axis_name: Optional[str] = None,
    ) -> "ModelConfig":
        split = bool(getattr(options, "split_event_targets", False))
        chunk = int(getattr(options, "embedder_chunk", 0) or 0)
        if chunk and embedder != "sdxl":
            raise ValueError(
                "embedder_chunk is only valid with the sdxl embedder: its "
                "GroupNorm is per-sample so chunked == full-bank exactly; "
                "the BatchNorm families compute bank-wide statistics "
                f"(got embedder={embedder!r})"
            )
        # The class count is data-inferred (max target + 1), so a detailed
        # file missing the rare class 9 is still valid; only the 10->4
        # remap (or an out-of-scheme file) must be rejected.
        if split and (
            getattr(options, "event_current_targets", False)
            or num_event_classes > 10
        ):
            raise ValueError(
                "split_event_targets derives current/generation targets from "
                "the 10-class detailed event target; disable "
                "event_current_targets (got a "
                f"{num_event_classes}-class dataset)"
            )
        return cls(
            hidden_dim=options.hidden_dim,
            initial_feature_dim=options.initial_feature_dim,
            initial_pixel_dim=options.initial_pixel_dim,
            feature_embedding_dim=make_divisible(options.feature_embedding_dim, 8),
            pixel_embedding_dim=make_divisible(options.pixel_embedding_dim, 8),
            position_embedding_dim=make_divisible(options.position_embedding_dim, 8),
            num_embedding_layers=options.num_embedding_layers,
            num_encoder_layers=options.num_encoder_layers,
            num_prong_decoder_layers=options.num_prong_decoder_layers,
            num_attention_heads=options.num_attention_heads,
            transformer_activation=options.transformer_activation,
            transformer_norm_first=options.transformer_norm_first,
            linear_prelu_activation=options.linear_prelu_activation,
            linear_batch_norm=options.linear_batch_norm,
            disable_smart_features=options.disable_smart_features,
            one_hot_pixels=options.one_hot_pixels,
            log_pixels=options.log_pixels,
            densenet_structure=tuple(options.densenet_structure),
            densenet_growth_rate=options.densenet_growth_rate,
            densenet_batch_norm_size=options.densenet_batch_norm_size,
            mobilenet_structure=(
                tuple(tuple(row) for row in options.mobilenet_structure)
                if options.mobilenet_structure else None
            ),
            dropout=options.dropout,
            pixel_noise_std=options.pixel_noise_std,
            features_dim=features_dim,
            extra_dim=extra_dim,
            pixel_channels=pixel_channels,
            image_height=image_shape[0],
            image_width=image_shape[1],
            num_event_classes=4 if split else num_event_classes,
            num_prong_classes=num_prong_classes,
            num_generation_classes=4 if split else 0,
            learned_classifier_token=getattr(options, "learned_classifier_token", False),
            embedder=embedder,
            compute_dtype=options.compute_dtype,
            axis_name=axis_name,
            remat_cnn=options.remat_cnn,
            remat_embedder=getattr(options, "remat_embedder", False),
            embedder_chunk=chunk,
            embedder_chunk_save_spatial=int(
                getattr(options, "embedder_chunk_save_spatial", 0) or 0),
            stem_space_to_depth=bool(
                getattr(options, "stem_space_to_depth", False)),
            transition_pool_first=bool(
                getattr(options, "transition_pool_first", False)),
        )

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def cnn_input_channels(self) -> int:
        return self.pixel_channels * 256 if self.one_hot_pixels else self.pixel_channels


def _embedder_spec(cfg: ModelConfig, output_dim: int):
    """Embedder registry: one CNN family per reference network subclass.
    Returns ``(module_class, constructor_kwargs)`` so wrappers (nn.remat)
    can be applied to the class before instantiation."""
    if cfg.embedder == "dense":
        return DenseNet, dict(
            output_dim=output_dim,
            initial_features=cfg.initial_pixel_dim,
            growth_rate=cfg.densenet_growth_rate,
            batch_norm_size=cfg.densenet_batch_norm_size,
            block_config=cfg.densenet_structure,
            dropout=cfg.dropout,
            remat=cfg.remat_cnn,
            stem_space_to_depth=cfg.stem_space_to_depth,
            stem_in_channels=cfg.cnn_input_channels,
            transition_pool_first=cfg.transition_pool_first,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
        )
    if cfg.embedder == "sdxl":
        from .sdxl import SDXLEncoder

        return SDXLEncoder, dict(
            output_dim=output_dim,
            init_block_dim=cfg.initial_pixel_dim,
            repeat_block_dim=2,
            num_blocks=4,
            norm_num_groups=1,
            dtype=cfg.dtype,
            save_spatial=cfg.embedder_chunk_save_spatial,
        )
    if cfg.embedder == "coo":
        from .coo_densenet import CooStemDenseNet

        return CooStemDenseNet, dict(
            output_dim=output_dim,
            image_height=cfg.image_height,
            image_width=cfg.image_width,
            initial_features=cfg.initial_pixel_dim,
            growth_rate=cfg.densenet_growth_rate,
            batch_norm_size=cfg.densenet_batch_norm_size,
            block_config=cfg.densenet_structure,
            dropout=cfg.dropout,
            remat=cfg.remat_cnn,
            transition_pool_first=cfg.transition_pool_first,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
        )
    if cfg.embedder == "sparse":
        from .sparse_densenet import SparseDenseNet

        return SparseDenseNet, dict(
            output_dim=output_dim,
            initial_features=cfg.initial_pixel_dim,
            growth_rate=cfg.densenet_growth_rate,
            batch_norm_size=cfg.densenet_batch_norm_size,
            block_config=cfg.densenet_structure,
            dropout=cfg.dropout,
            remat=cfg.remat_cnn,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
        )
    if cfg.embedder == "mobilenet":
        from .mobilenet import DEFAULT_STRUCTURE, MobileNetV2

        return MobileNetV2, dict(
            output_dim=output_dim,
            initial_features=cfg.initial_pixel_dim,
            structure=cfg.mobilenet_structure or DEFAULT_STRUCTURE,
            input_shape=(cfg.image_height, cfg.image_width),
            dropout=cfg.dropout,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
        )
    if cfg.embedder == "resnet":
        from .resnet import ResNetStack

        return ResNetStack, dict(
            output_dim=output_dim,
            initial_features=cfg.initial_pixel_dim,
            dropout=cfg.dropout,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
        )
    if cfg.embedder == "convnext":
        from .sparse_convnext import SparseConvNeXt

        return SparseConvNeXt, dict(
            output_dim=output_dim,
            drop_path_rate=cfg.dropout,
            dropout=cfg.dropout,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
        )
    if cfg.embedder == "fcnn":
        from .sparse_fcnn import SparseFCNN

        return SparseFCNN, dict(
            output_dim=output_dim,
            initial_features=cfg.initial_pixel_dim,
            dropout=cfg.dropout,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
        )
    raise ValueError(f"unknown embedder family: {cfg.embedder}")


def create_pixel_embedder(cfg: ModelConfig, output_dim: int, name: str) -> nn.Module:
    """Instantiate the configured embedder family as submodule ``name``."""
    cls, kwargs = _embedder_spec(cfg, output_dim)
    if cfg.remat_embedder:
        # Whole-embedder rematerialization: only the CNN's inputs/outputs
        # persist across forward; the backward recomputes the CNN (nesting
        # with per-bottleneck remat keeps the recompute's own temps small).
        # The lifted transform keeps the explicit ``name``, so the parameter
        # tree — and checkpoints — are identical with the flag off.
        cls = nn.remat(cls, static_argnums=(3,))
    return cls(**kwargs, name=name)


def apply_embedder(cnn: nn.Module, images, mask, train: bool, chunk: int,
                   save_spatial: int = 0):
    """Apply a pixel embedder to an image bank, optionally in sequential
    ``chunk``-row slices (``cfg.embedder_chunk``).

    The chunked path is an ``nn.scan`` over bank slices with a rematted
    body: live CNN activations are capped at one chunk's worth instead of
    the whole bank, which is what fits the SDXL family's backward on a
    16 GiB chip (the packed-prong bank floors at 128 slots and each
    400x280 image carries ~0.5 GiB of resnet-block activations).  Params
    are ``variable_broadcast`` so the tree — and checkpoints — are
    identical with chunking off; SDXL's GroupNorm is per-sample, so the
    chunked output is the full-bank output exactly.

    A bank no larger than ``chunk`` runs as a single scan step (still
    rematted — an un-rematted full call on, say, a 16-image SDXL event
    bank is exactly the OOM the option prevents); a larger bank that
    ``chunk`` does not divide falls back to one full-bank call with a
    trace-time warning.
    """
    # `images` is a hit-bank tuple for the coo family (never chunked).
    if chunk <= 0 or isinstance(images, tuple):
        return cnn(images, mask, train)
    n = images.shape[0]
    chunk = min(chunk, n)
    if n % chunk != 0:
        # Bank sizes are static under jit, so this fires at trace time.
        # A silently skipped chunking on a large bank is exactly the OOM
        # the option exists to prevent (packed prong banks are multiples
        # of 128 slots, so a non-dividing chunk there is a config bug).
        import warnings

        warnings.warn(
            f"embedder_chunk={chunk} does not divide bank size {n}; "
            f"falling back to ONE full-bank call — expect the OOM "
            f"chunking was meant to avoid. Pick a chunk dividing {n}.",
            stacklevel=2,
        )
        return cnn(images, mask, train)
    xs = images.reshape(n // chunk, chunk, *images.shape[1:])
    ms = (
        jnp.ones((n // chunk, chunk), bool)
        if mask is None
        else mask.reshape(n // chunk, chunk)
    )

    def body(mdl, carry, x):
        images_c, mask_c = x
        return carry, mdl(images_c, mask_c, train)

    if save_spatial > 0:
        # Selective remat: keep the tagged small-spatial conv outputs
        # (models.sdxl._maybe_save) across the scan; recompute the rest.
        remat_body = nn.remat(
            body, prevent_cse=False,
            policy=jax.checkpoint_policies.save_only_these_names(
                "embedder_chunk_saved"),
        )
    else:
        remat_body = nn.remat(body, prevent_cse=False)

    scanned = nn.scan(
        remat_body,
        variable_broadcast=("params", "batch_stats"),
        split_rngs={"params": False, "dropout": True, "noise": True},
        in_axes=0,
        out_axes=0,
    )
    _, ys = scanned(cnn, None, (xs, ms))
    return ys.reshape(n, ys.shape[-1])


class TransformerCVN(nn.Module):
    """Full network; see module docstring for the layer map."""

    cfg: ModelConfig

    def preprocess_values(self, values: jnp.ndarray, train: bool) -> jnp.ndarray:
        """Pixel-value preprocessing (neutrino_full_dense_trainer.py:46-66):
        one-hot(256) per view, or log1p / divide-by-255 plus train-time
        multiplicative Gaussian noise."""
        cfg = self.cfg
        if cfg.one_hot_pixels:
            n, c = values.shape
            one_hot = jax.nn.one_hot(values.astype(jnp.int32), 256, dtype=cfg.dtype)
            return one_hot.reshape(n, 256 * c)

        values = jnp.log1p(values) if cfg.log_pixels else values / 255.0
        if train and cfg.pixel_noise_std > 0:
            noise = jax.random.normal(self.make_rng("noise"), values.shape, jnp.float32)
            values = values * (1.0 + noise * cfg.pixel_noise_std)
        return values.astype(cfg.dtype)

    def __call__(
        self,
        batch,
        norm,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward pass on one (per-device) shard.

        ``batch``: dict with the batcher's per-shard arrays.
        ``norm``: dict with 'mean', 'std', 'extra_mean', 'extra_std'
        (dataset statistics; shipped inside the checkpointed state like the
        reference's frozen stat Parameters, neutrino_base.py:32-45).
        Returns float32 ``(event_logits [B, Kev], prong_logits [B, P, Kpr])``.
        """
        cfg = self.cfg
        B = batch["features"].shape[0]
        P = batch["slot_batch"].shape[0]
        H, W = cfg.image_height, cfg.image_width

        # ---- pixel-map inputs -------------------------------------------------
        # 'coo' embedder: feed the hit banks straight to the sparse stem —
        # the input images are never densified at full resolution (the ME
        # execution model, sparse_dense_net.py:39-44).  Every other family
        # gets the densified NHWC images (static scatter-add, padding dropped).
        if cfg.embedder == "coo":
            event_images = (
                batch["event_xy"],
                self.preprocess_values(batch["event_vals"], train),
                batch["event_owner"], B,
                batch.get("event_starts"),
            )
            prong_images = (
                batch["prong_xy"],
                self.preprocess_values(batch["prong_vals"], train),
                batch["prong_owner"], P,
                batch.get("prong_starts"),
            )
        else:
            # With the space-to-depth stem on, the dense family's images are
            # built directly in s2d layout [N, H/2, W/2, 4C] — the Pallas
            # densify kernel emits it from the hit coordinates for free,
            # deleting the transpose pass that round 4 measured eating the
            # stem fusion win (SpaceToDepthStem detects the layout and skips
            # its own reshape; other families' stems are not s2d-aware).
            s2d = (cfg.stem_space_to_depth and cfg.embedder == "dense"
                   and H % 2 == 0 and W % 2 == 0)
            event_images = densify_images(
                batch["event_xy"],
                self.preprocess_values(batch["event_vals"], train),
                batch["event_owner"], B, H, W,
                starts=batch.get("event_starts"),
                space_to_depth=s2d,
            )
            prong_images = densify_images(
                batch["prong_xy"],
                self.preprocess_values(batch["prong_vals"], train),
                batch["prong_owner"], P, H, W,
                starts=batch.get("prong_starts"),
                space_to_depth=s2d,
            )

        event_logits, prong_logits, _, _ = self.forward_from_images(
            event_images,
            prong_images,
            batch["features"],
            batch["extra"],
            batch["prong_mask"],
            batch["slot_batch"],
            batch["slot_pos"],
            batch["slot_mask"],
            norm,
            train,
        )
        return event_logits, prong_logits

    @nn.compact
    def forward_from_images(
        self,
        event_images,   # [B, H, W, C] preprocessed NHWC
        prong_images,   # [P, H, W, C] preprocessed NHWC (packed slots)
        features,       # [B, max_prongs, F]
        extra,          # [B, E]
        prong_mask,     # [B, max_prongs] bool
        slot_batch,     # [P]
        slot_pos,       # [P]
        slot_mask,      # [P] bool
        norm,
        train: bool = False,
    ):
        """Image-level forward; also the export entry point
        (CreateCompiled.ipynb wrappers feed dense images directly).

        Returns float32 (event_logits, prong_logits, event_hidden [B, D],
        prong_hidden [B, max_prongs, D]) — the hidden pair being the
        transformer representations the `embeddings` export exposes.
        """
        cfg = self.cfg
        B = features.shape[0]
        P = slot_batch.shape[0]

        # ---- pixel CNNs ------------------------------------------------------
        event_pixel_dim = cfg.pixel_embedding_dim + cfg.feature_embedding_dim
        event_cnn = create_pixel_embedder(cfg, event_pixel_dim, "event_pixel_embedding")
        prong_cnn = create_pixel_embedder(cfg, cfg.pixel_embedding_dim, "prong_pixel_embedding")

        event_pixel_emb = apply_embedder(
            event_cnn, event_images, None, train, cfg.embedder_chunk,
            cfg.embedder_chunk_save_spatial,
        )                                                                # [B, pix+feat]
        prong_pixel_emb = apply_embedder(
            prong_cnn, prong_images, slot_mask, train, cfg.embedder_chunk,
            cfg.embedder_chunk_save_spatial,
        )                                                                # [P, pix]

        # ---- packed prong reco features -------------------------------------
        packed_features = pack_rows(features, slot_batch, slot_pos)
        packed_features = (packed_features - norm["mean"]) / norm["std"]
        packed_extra = extra[jnp.clip(slot_batch, 0, B - 1)]
        packed_extra = (packed_extra - norm["extra_mean"]) / norm["extra_std"]

        feature_emb = FeatureEmbedding(
            output_dim=cfg.feature_embedding_dim,
            initial_dim=cfg.initial_feature_dim,
            max_layers=cfg.num_embedding_layers,
            disabled=cfg.disable_smart_features,
            batch_norm=cfg.linear_batch_norm,
            prelu=cfg.linear_prelu_activation,
            dropout=cfg.dropout,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
            name="feature_embedding",
        )(packed_features.astype(cfg.dtype), packed_extra.astype(cfg.dtype), slot_mask, train)

        # ---- learned type position embeddings --------------------------------
        event_position = self.param(
            "event_position_embedding",
            nn.initializers.normal(1.0),
            (1, cfg.position_embedding_dim),
            jnp.float32,
        )
        prong_position = self.param(
            "prong_position_embedding",
            nn.initializers.normal(1.0),
            (1, cfg.position_embedding_dim),
            jnp.float32,
        )
        # Reference quirk preserved by default: prongs reuse the event vector.
        prong_pos_used = prong_position if cfg.fix_prong_position_embedding else event_position

        event_tokens = jnp.concatenate(
            [event_pixel_emb, jnp.broadcast_to(event_position, (B, cfg.position_embedding_dim)).astype(cfg.dtype)],
            axis=1,
        )
        prong_tokens = jnp.concatenate(
            [
                feature_emb,
                prong_pixel_emb,
                jnp.broadcast_to(prong_pos_used, (P, cfg.position_embedding_dim)).astype(cfg.dtype),
            ],
            axis=1,
        )

        # ---- shared combined embedding over [event rows; packed prong rows] --
        combined = jnp.concatenate([event_tokens, prong_tokens], axis=0)
        combined_mask = jnp.concatenate(
            [jnp.ones((B,), bool), slot_mask.astype(bool)], axis=0
        )
        combined = LinearBlock(
            cfg.hidden_dim,
            batch_norm=cfg.linear_batch_norm,
            prelu=cfg.linear_prelu_activation,
            dropout=cfg.dropout,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
            name="combined_embedding",
        )(combined, combined_mask, train)

        event_hidden = combined[:B]
        prong_hidden = pad_rows(combined[B:], slot_batch, slot_pos, B, cfg.max_prongs)

        # ---- sequence assembly + shared transformer --------------------------
        sequence = jnp.concatenate([event_hidden[:, None, :], prong_hidden], axis=1)
        sequence_mask = jnp.concatenate(
            [jnp.ones((B, 1), bool), prong_mask.astype(bool)], axis=1
        )
        # ClassifierProng variant (neutrino_combined_network.py:104-121): a
        # learned token ahead of the event token; the event class is decoded
        # from it, the event-image token contributes via attention only.
        cls_offset = 1 if cfg.learned_classifier_token else 0
        if cfg.learned_classifier_token:
            cls_token = self.param(
                "classifier_embedding",
                nn.initializers.normal(1.0),
                (1, 1, cfg.hidden_dim),
                jnp.float32,
            )
            sequence = jnp.concatenate(
                [jnp.broadcast_to(cls_token, (B, 1, cfg.hidden_dim)).astype(cfg.dtype), sequence],
                axis=1,
            )
            sequence_mask = jnp.concatenate(
                [jnp.ones((B, 1), bool), sequence_mask], axis=1
            )
        hidden = TransformerEncoder(
            hidden_dim=cfg.hidden_dim,
            num_heads=cfg.num_attention_heads,
            num_layers=cfg.num_encoder_layers,
            dropout=cfg.dropout,
            activation=cfg.transformer_activation,
            norm_first=cfg.transformer_norm_first,
            dtype=cfg.dtype,
            name="encoder",
        )(sequence, sequence_mask, train)

        # ---- heads ------------------------------------------------------------
        # Split variant: [current ‖ generation] logits from one wider linear —
        # identical math to the reference's two decoders on the same token
        # (neutrino_split_trainer.py:45-46); the loss slices the two blocks.
        event_logits = EventDecoder(
            cfg.num_event_classes + cfg.num_generation_classes,
            dtype=cfg.dtype,
            name="event_decoder",
        )(hidden[:, 0])
        prong_tokens_hidden = hidden[:, 1 + cls_offset:]
        prong_logits = ProngDecoder(
            num_classes=cfg.num_prong_classes,
            hidden_dim=cfg.hidden_dim,
            num_layers=cfg.num_prong_decoder_layers,
            batch_norm=cfg.linear_batch_norm,
            prelu=cfg.linear_prelu_activation,
            dropout=cfg.dropout,
            dtype=cfg.dtype,
            axis_name=cfg.axis_name,
            name="prong_decoder",
        )(prong_tokens_hidden, prong_mask.astype(bool), train)

        return (
            event_logits.astype(jnp.float32),
            prong_logits.astype(jnp.float32),
            hidden[:, 0].astype(jnp.float32),
            prong_tokens_hidden.astype(jnp.float32),
        )
