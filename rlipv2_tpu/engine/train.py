"""pjit train step — the TPU-native replacement for the reference's
`train_one_epoch` inner loop (reference: engine.py:45-201).

Global-program SPMD: the step is written once over global arrays; the
batch is sharded on the mesh's `data` axis, params are replicated, and
XLA inserts the gradient all-reduce (the reference's DDP). The
num_interactions normalizer is a global sum by construction (the reference
all-reduces it explicitly at models/hoi.py:4738-4740).

NaN-loss handling: the reference aborts training on non-finite loss
(engine.py:125-128). In a jit graph we instead skip the update (zero the
grads) and surface a `nonfinite` flag in the metrics for the host loop to
act on.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rlipv2_tpu.config import LossConfig, ModelConfig, TrainConfig
from rlipv2_tpu.engine.optim import build_optimizer, update_ema
from rlipv2_tpu.losses.criterion import SetCriterionHOI
from rlipv2_tpu.structures import HOITargets


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any  # None when EMA disabled
    rng: jnp.ndarray


class TrainBatch(NamedTuple):
    pixels: jnp.ndarray  # (B, H, W, 3)
    pixel_valid: jnp.ndarray  # (B, H, W)
    text_emb: jnp.ndarray  # (B, T, l_dim)
    text_valid: jnp.ndarray  # (B, T)
    targets: HOITargets
    # tokenized slot texts (T, L) int32 — when present, the train step runs
    # encode_text INSIDE the loss so gradients reach the RoBERTa text
    # encoder (the reference trains it with its own lr group,
    # main.py:520-536 text_encoder_lr; text_emb is then only the
    # pseudo-verb offline feature source)
    token_ids: Optional[jnp.ndarray] = None
    token_mask: Optional[jnp.ndarray] = None


def create_train_state(
    params,
    tcfg: TrainConfig,
    steps_per_epoch: int = 1000,
    freeze_text_encoder: bool = False,
) -> tuple[TrainState, optax.GradientTransformation]:
    tx = build_optimizer(tcfg, params["params"], steps_per_epoch, freeze_text_encoder)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params["params"]),
        # deep copy: EMA must not alias param buffers (donation requires
        # distinct buffers per argument)
        ema_params=(
            jax.tree_util.tree_map(jnp.copy, params) if tcfg.ema else None
        ),
        rng=jax.random.PRNGKey(tcfg.seed),
    )
    return state, tx


def make_train_step(
    model,
    criterion: SetCriterionHOI,
    tx: optax.GradientTransformation,
    mcfg: ModelConfig,
    tcfg: TrainConfig,
    mesh: Optional[Mesh] = None,
    accumulation_steps: int = 1,
    deterministic: bool = False,
    state_sharding: Optional["TrainState"] = None,
    tagger: bool = False,
    box_noise_scale: float = 0.6,
    label_noise_scale: float = 0.3,
    text_tokens: bool = False,
):
    """Returns a jitted train_step(state, batch) -> (state, metrics).

    accumulation_steps > 1 reproduces the reference's multi-dataset
    gradient accumulation (reference: engine.py:138-165 with
    BatchIterativeDistributedSampler — one dataset per micro-batch): the
    batch arrays carry a leading (K, ...) micro-batch axis and a lax.scan
    averages the K gradients before one optimizer update.

    tagger=True trains the R-Tagger: `forward_tagger` consumes the GT
    pairs as DN-noised queries and the slot-aligned `tagger_losses`
    replace the Hungarian criterion (reference: main.py --verb_tagger,
    scripts/verb_tagger/train_vg_RLIP_ParSeD_v2_tagger_resnet.sh:14-56
    with label_noise 0.3 / box_noise 0.6)."""

    def batch_text_emb(params, batch: TrainBatch, rng):
        """(B, T, l_dim) text features for the forward: encoded in-graph
        from the slot tokens when provided (text-encoder training), else
        the precomputed batch features (frozen text encoder)."""
        if batch.token_ids is None:
            return batch.text_emb, rng
        rng, text_rng = jax.random.split(rng)
        pooled = model.apply(
            {"params": params},
            batch.token_ids,
            batch.token_mask,
            deterministic,
            method=type(model).encode_text,
            rngs={"dropout": text_rng},
        )  # (T, l_dim)
        B = batch.pixels.shape[0]
        return (
            jnp.broadcast_to(pooled[None], (B, *pooled.shape)),
            rng,
        )

    def tagger_loss_fn(params, batch: TrainBatch, rng):
        text_emb, rng = batch_text_emb(params, batch, rng)
        noise_rng, drop_rng = jax.random.split(rng)
        out = model.apply(
            {"params": params},
            batch.pixels,
            batch.pixel_valid,
            text_emb,
            batch.text_valid,
            batch.targets,
            noise_rng,
            mcfg.max_obj_texts,
            deterministic=deterministic,
            box_noise_scale=box_noise_scale,
            label_noise_scale=label_noise_scale,
            training=True,
            method=type(model).forward_tagger,
            rngs={"dropout": drop_rng},
        )
        obj_valid = batch.text_valid[:, : mcfg.max_obj_texts]
        verb_valid = batch.text_valid[:, mcfg.max_obj_texts :]
        losses = criterion.tagger_losses(
            out, batch.targets, obj_valid, verb_valid
        )
        return criterion.weighted_total(losses), losses

    def hoi_loss_fn(params, batch: TrainBatch, rng):
        text_emb, rng = batch_text_emb(params, batch, rng)
        out = model.apply(
            {"params": params},
            batch.pixels,
            batch.pixel_valid,
            text_emb,
            batch.text_valid,
            mcfg.max_obj_texts,
            deterministic=deterministic,
            rngs={"dropout": rng},
        )
        obj_valid = batch.text_valid[:, : mcfg.max_obj_texts]
        verb_valid = batch.text_valid[:, mcfg.max_obj_texts :]
        target_verb_sim = None
        if mcfg.pseudo_verb:
            from rlipv2_tpu.losses.pseudo_verb import pseudo_verb_similarity

            if mcfg.pseudo_verb_mode == "online":
                # post-ALIF language states of the current forward,
                # Euclidean metric (reference: models/hoi.py:2197-2207)
                feats = jax.lax.stop_gradient(
                    out["lang_states"][0, mcfg.max_obj_texts :]
                )
                metric = "euclidean"
            else:
                # offline: precomputed pooled text features, cosine metric
                # (reference: models/hoi.py:2209-2216)
                feats = batch.text_emb[0, mcfg.max_obj_texts :]
                metric = "cosine"
            target_verb_sim = pseudo_verb_similarity(
                feats, batch.targets.verb_labels, verb_valid, metric=metric,
            )
        losses = criterion(
            out, batch.targets, obj_valid, verb_valid,
            target_verb_sim=target_verb_sim,
        )
        total = criterion.weighted_total(losses)
        return total, losses

    loss_fn = tagger_loss_fn if tagger else hoi_loss_fn

    def grads_single(params, batch, rng):
        return jax.value_and_grad(loss_fn, has_aux=True)(params, batch, rng)

    def grads_accumulated(params, batch, rng):
        """batch leaves have a leading (K, ...) micro-batch axis."""
        rngs = jax.random.split(rng, accumulation_steps)

        def body(carry, xs):
            total_acc, losses_acc, grads_acc = carry
            micro, r = xs
            (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, micro, r
            )
            return (
                total_acc + total,
                jax.tree_util.tree_map(jnp.add, losses_acc, losses),
                jax.tree_util.tree_map(jnp.add, grads_acc, grads),
            ), None

        micro0 = jax.tree_util.tree_map(lambda x: x[0], batch)
        (t0, l0), g0 = jax.value_and_grad(loss_fn, has_aux=True)(
            params, micro0, rngs[0]
        )
        rest = jax.tree_util.tree_map(lambda x: x[1:], batch)
        (total, losses, grads), _ = jax.lax.scan(
            body, (t0, l0, g0), (rest, rngs[1:])
        )
        k = float(accumulation_steps)
        return (
            (total / k, jax.tree_util.tree_map(lambda x: x / k, losses)),
            jax.tree_util.tree_map(lambda x: x / k, grads),
        )

    def train_step(state: TrainState, batch: TrainBatch):
        rng, step_rng = jax.random.split(state.rng)
        grad_fn = grads_single if accumulation_steps == 1 else grads_accumulated
        (total, losses), grads = grad_fn(state.params["params"], batch, step_rng)
        finite = jnp.isfinite(total)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads
        )
        updates, opt_state = tx.update(
            grads, state.opt_state, state.params["params"]
        )
        new_params = optax.apply_updates(state.params["params"], updates)
        params = {**state.params, "params": new_params}
        ema = state.ema_params
        if ema is not None:
            ema = {
                **ema,
                "params": update_ema(ema["params"], new_params, tcfg.ema_decay),
            }
        metrics = {
            "loss": total,
            "nonfinite": (~finite).astype(jnp.float32),
            "grad_norm": optax.global_norm(grads),
            **losses,
        }
        return (
            TrainState(state.step + 1, params, opt_state, ema, rng),
            metrics,
        )

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    # with accumulation the leading axis is the micro-batch scan axis;
    # the data-parallel shard axis is the one after it
    data = NamedSharding(
        mesh, P("data") if accumulation_steps == 1 else P(None, "data")
    )
    batch_sh = TrainBatch(
        pixels=data,
        pixel_valid=data,
        text_emb=data,
        text_valid=data,
        targets=HOITargets(data, data, data, data, data, data),
        # slot tokens are shared across the batch -> replicated (None when
        # the caller feeds precomputed text_emb; pytrees treat None as an
        # empty subtree so the structures still match)
        token_ids=repl if text_tokens else None,
        token_mask=repl if text_tokens else None,
    )
    if state_sharding is None:
        state_sharding = TrainState(repl, repl, repl, repl, repl)
    return jax.jit(
        train_step,
        in_shardings=(state_sharding, batch_sh),
        out_shardings=(state_sharding, repl),
        donate_argnums=(0,),
    )


def fsdp_state_sharding(
    mesh: Mesh,
    state: TrainState,
    axis: str = "model",
    min_size: int = 1 << 17,
) -> TrainState:
    """FSDP-style parameter sharding over the mesh's `model` axis for the
    big backbones (SURVEY §2.8: the reserved second axis for Swin-L).

    Every param (and its optimizer/EMA twin) whose size >= min_size and
    which has a dimension divisible by the axis length is sharded along
    its largest such dimension; everything else is replicated. XLA's SPMD
    partitioner inserts the all-gathers around each use and
    reduce-scatters the gradients — the JAX spelling of ZeRO-3.

    Gather-consumed embedding tables (flax nn.Embed leaves named
    "embedding": RoBERTa word/position/token_type tables) are REPLICATED:
    sharding a table whose consumer is a row-gather makes XLA SPMD
    all-gather it and then "involuntarily fully rematerialize" the result
    to reach the consumer's sharding — wasted HBM + ICI every step
    (observed on the RoBERTa position_embeddings in MULTICHIP_r04's tail;
    VERDICT r4 next #4)."""
    repl = NamedSharding(mesh, P())
    n = mesh.shape[axis]

    def rule(path, x):
        shape = getattr(x, "shape", None)
        if not shape or n <= 1:
            return repl
        if path and str(getattr(path[-1], "key", "")) == "embedding":
            return repl
        size = 1
        for d in shape:
            size *= d
        if size < min_size:
            return repl
        for d in sorted(range(len(shape)), key=lambda i: -shape[i]):
            if shape[d] % n == 0:
                spec = [None] * len(shape)
                spec[d] = axis
                return NamedSharding(mesh, P(*spec))
        return repl

    def map_tree(tree):
        return jax.tree_util.tree_map_with_path(rule, tree)

    return TrainState(
        step=repl,
        params=map_tree(state.params),
        opt_state=map_tree(state.opt_state),
        ema_params=(
            map_tree(state.ema_params)
            if state.ema_params is not None
            else None
        ),
        rng=repl,
    )


# Megatron-style column/row parallel rules by param-path suffix: the
# column-parallel weight splits its OUTPUT features over `model`, the
# paired row-parallel weight splits its INPUT features, so the activation
# between them stays sharded and XLA inserts exactly one reduce per pair.
_TP_COL = (
    "linear1/kernel",          # deformable/decoder/parse FFN up-proj
    "mlp_fc1/kernel",          # swin MLP up-proj
    "intermediate_dense/kernel",  # roberta FFN up-proj
    "v_proj/kernel", "l_proj/kernel",  # BiMHA q/k projections
    "values_v_proj/kernel", "values_l_proj/kernel",
)
_TP_COL_BIAS = tuple(k.replace("/kernel", "/bias") for k in _TP_COL)
_TP_ROW = (
    "linear2/kernel",
    "mlp_fc2/kernel",
    "output_dense/kernel",
    "out_v_proj/kernel", "out_l_proj/kernel",
)


def tp_state_sharding(
    mesh: Mesh,
    state: TrainState,
    axis: str = "model",
) -> TrainState:
    """Tensor (Megatron-style) parallelism over the mesh's `model` axis:
    FFN up-projections and the BiMHA fusion projections are
    column-parallel, their paired down-projections row-parallel; XLA's
    SPMD partitioner propagates the activation shardings and inserts the
    single all-reduce per pair. Everything else (including every param the
    rules don't name) is replicated, so TP composes with data parallelism
    on the `data` axis. Numerically identical to pure DP (tested on the
    virtual mesh)."""
    repl = NamedSharding(mesh, P())
    n = mesh.shape[axis]

    def rule_with_path(path, x):
        shape = getattr(x, "shape", None)
        if not shape or n <= 1:
            return repl
        name = "/".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        if name.endswith(_TP_COL) and shape[-1] % n == 0:
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis))
        if name.endswith(_TP_COL_BIAS) and shape[-1] % n == 0:
            return NamedSharding(mesh, P(*([None] * (len(shape) - 1)), axis))
        if (
            name.endswith(_TP_ROW)
            and len(shape) >= 2
            and shape[-2] % n == 0
        ):
            return NamedSharding(
                mesh, P(*([None] * (len(shape) - 2)), axis, None)
            )
        return repl

    def map_tree(tree):
        return jax.tree_util.tree_map_with_path(rule_with_path, tree)

    return TrainState(
        step=repl,
        params=map_tree(state.params),
        opt_state=map_tree(state.opt_state),
        ema_params=(
            map_tree(state.ema_params)
            if state.ema_params is not None
            else None
        ),
        rng=repl,
    )


def hybrid_state_sharding(
    mesh: Mesh,
    state: TrainState,
    axis: str = "model",
    min_size: int = 1 << 17,
) -> TrainState:
    """TP where the Megatron rules apply (FFN/BiMHA column/row pairs,
    `tp_state_sharding`), FSDP (ZeRO-3 largest-divisible-dim,
    `fsdp_state_sharding`) for everything else. One train-step program
    under this sharding exercises BOTH rule sets — the dryrun uses it to
    validate TP and FSDP in a single compile instead of two
    (VERDICT r4 next #1b)."""
    tp = tp_state_sharding(mesh, state, axis=axis)
    fsdp = fsdp_state_sharding(mesh, state, axis=axis, min_size=min_size)
    repl = NamedSharding(mesh, P())

    def pick(t, f):
        return t if t != repl else f

    return jax.tree_util.tree_map(
        pick, tp, fsdp,
        is_leaf=lambda x: isinstance(x, NamedSharding) or x is None,
    )
