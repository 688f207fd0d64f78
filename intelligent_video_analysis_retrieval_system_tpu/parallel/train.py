"""Distributed CLIP contrastive training (fine-tuning) over a device mesh.

The reference has no training at all (encoders are frozen HF black boxes,
SURVEY.md §2.3) — this module extends the capability surface so domain
adaptation of the embedding towers runs TPU-native:

- **DP**: batches shard over mesh axis ``data``;
- **TP**: tower weights shard over mesh axis ``model`` — attention q/k/v
  kernels and MLP fc split on the output feature dim, out/proj kernels on
  the input dim, so each pair forms a contract-then-reduce pattern XLA
  turns into one ``psum`` per block (Megatron-style sharding expressed
  purely through ``NamedSharding`` annotations);
- loss is the symmetric InfoNCE over the *global* batch: per-shard
  embeddings are all-gathered by XLA where needed (the logits matrix is
  tiny relative to tower compute).

``CLIPTrainer.train_step`` is a single pjit'd function — this is the
"full training step" exercised by ``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.clip import CLIPConfig, CLIPModel

__all__ = ["TrainConfig", "CLIPTrainer"]


@dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 0.2
    b1: float = 0.9
    b2: float = 0.98
    eps: float = 1e-6
    max_grad_norm: float = 1.0
    data_axis: str = "data"
    model_axis: str = "model"
    remat: bool = True  # rematerialize blocks: trade FLOPs for HBM
    # the fused Pallas MHA now carries a custom VJP (einsum-recompute
    # backward, ops/attention.py), so training keeps the fast forward;
    # set False to force the plain einsum path end to end
    fused_attn: bool = True
    # LR schedule: "constant" (default) or "warmup_cosine" (linear warmup
    # over ``warmup_steps`` then cosine decay to ``end_lr_factor * lr``
    # at ``total_steps`` — CLIP's published fine-tuning recipe shape)
    schedule: str = "constant"
    warmup_steps: int = 500
    total_steps: int = 10_000
    end_lr_factor: float = 0.1

    def make_schedule(self):
        if self.schedule == "constant":
            return self.learning_rate
        if self.schedule == "warmup_cosine":
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0,
                peak_value=self.learning_rate,
                warmup_steps=self.warmup_steps,
                decay_steps=self.total_steps,
                end_value=self.learning_rate * self.end_lr_factor,
            )
        raise ValueError(f"unknown schedule {self.schedule!r}")


def _param_pspec(path: tuple[str, ...], leaf: jnp.ndarray, model_axis: str) -> P:
    """Tensor-parallel layout rules for CLIP tower params."""
    names = [getattr(p, "key", str(p)) for p in path]
    joined = "/".join(names)
    if leaf.ndim == 2:
        # column-parallel: split output features
        if any(s in joined for s in ("q_proj/kernel", "k_proj/kernel",
                                     "v_proj/kernel", "mlp_fc/kernel")):
            return P(None, model_axis)
        # row-parallel: split input features (partial sums -> psum)
        if any(s in joined for s in ("out_proj/kernel", "mlp_proj/kernel")):
            return P(model_axis, None)
        if "token_embedding" in joined:
            return P(None, None)
    if leaf.ndim == 1:
        if any(s in joined for s in ("q_proj/bias", "k_proj/bias",
                                     "v_proj/bias", "mlp_fc/bias")):
            return P(model_axis)
    return P()  # replicate everything else (LN, embeddings, projections)


class CLIPTrainer:
    """pjit'd contrastive trainer over a ("data", "model") mesh."""

    def __init__(
        self,
        config: CLIPConfig,
        mesh: Mesh,
        train_config: TrainConfig | None = None,
        dtype: Any = jnp.bfloat16,
    ) -> None:
        self.config = config
        self.mesh = mesh
        self.tc = train_config or TrainConfig()
        self.model = CLIPModel(config, dtype=dtype, remat=self.tc.remat,
                               fused_attn=self.tc.fused_attn)
        self.tx = optax.chain(
            optax.clip_by_global_norm(self.tc.max_grad_norm),
            optax.adamw(
                self.tc.make_schedule(), b1=self.tc.b1, b2=self.tc.b2,
                eps=self.tc.eps, weight_decay=self.tc.weight_decay,
            ),
        )
        self._train_step = None
        self._param_shardings = None

    # -- sharding -----------------------------------------------------------

    def shard_params(self, params: Any) -> Any:
        """Apply TP/replicated shardings to a param tree."""
        axis = self.tc.model_axis

        def spec_of(path, leaf):
            return NamedSharding(self.mesh, _param_pspec(path, leaf, axis))

        self._param_shardings = jax.tree_util.tree_map_with_path(
            spec_of, params
        )
        return jax.tree_util.tree_map(
            lambda leaf, s: jax.device_put(leaf, s), params, self._param_shardings
        )

    def batch_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, P(self.tc.data_axis))

    # -- init ---------------------------------------------------------------

    def init(self, rng: jax.Array | int = 0) -> tuple[Any, Any]:
        """Initialize sharded params + optimizer state."""
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        cfg = self.config
        pixels = jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3))
        tokens = jnp.zeros((1, cfg.text.max_length), jnp.int32)
        params = self.model.init(rng, pixels, tokens)["params"]
        params = self.shard_params(params)
        opt_state = self.tx.init(params)
        return params, opt_state

    # -- loss / step --------------------------------------------------------

    def loss_fn(self, params: Any, pixels: jnp.ndarray, tokens: jnp.ndarray):
        img = self.model.apply(
            {"params": params}, pixels, method=CLIPModel.encode_image
        ).astype(jnp.float32)
        txt = self.model.apply(
            {"params": params}, tokens, method=CLIPModel.encode_text
        ).astype(jnp.float32)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(jnp.clip(params["logit_scale"], 0.0, jnp.log(100.0)))
        logits = scale * img @ txt.T
        labels = jnp.arange(logits.shape[0])
        loss_i = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        loss_t = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
        loss = 0.5 * (loss_i.mean() + loss_t.mean())
        accuracy = jnp.mean(jnp.argmax(logits, axis=-1) == labels)
        return loss, {"loss": loss, "accuracy": accuracy, "scale": scale}

    def build_train_step(self):
        if self._train_step is not None:
            return self._train_step

        def step(params, opt_state, pixels, tokens):
            grad_fn = jax.value_and_grad(self.loss_fn, has_aux=True)
            (_, metrics), grads = grad_fn(params, pixels, tokens)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, metrics

        batch_sh = self.batch_sharding()
        self._train_step = jax.jit(
            step,
            in_shardings=(self._param_shardings, None, batch_sh, batch_sh),
            donate_argnums=(0, 1),
        )
        return self._train_step

    def train_step(self, params, opt_state, pixels: np.ndarray, tokens: np.ndarray):
        """One optimizer step; returns (params, opt_state, metrics)."""
        fn = self.build_train_step()
        batch_sh = self.batch_sharding()
        with self.mesh:
            return fn(
                params,
                opt_state,
                jax.device_put(jnp.asarray(pixels), batch_sh),
                jax.device_put(jnp.asarray(tokens), batch_sh),
            )

    # -- checkpointing (orbax) ------------------------------------------------

    def save_checkpoint(
        self, ckpt_dir, params, opt_state, step: int, keep: int = 3
    ) -> str:
        """Atomic sharded checkpoint via orbax (the reference had no
        training, hence no model checkpointing — the analogous subsystem
        there was the index builder's journal, SURVEY.md §5.4)."""
        import orbax.checkpoint as ocp

        from pathlib import Path

        ckpt_dir = Path(ckpt_dir).resolve()
        ckpt_dir.mkdir(parents=True, exist_ok=True)
        with ocp.CheckpointManager(
            ckpt_dir, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
        ) as mgr:
            mgr.save(
                step,
                args=ocp.args.Composite(
                    params=ocp.args.StandardSave(params),
                    opt_state=ocp.args.StandardSave(opt_state),
                ),
            )
            mgr.wait_until_finished()
        return str(ckpt_dir / str(step))

    def restore_checkpoint(self, ckpt_dir, step: int | None = None):
        """Restore (params, opt_state, step) with this trainer's shardings."""
        import orbax.checkpoint as ocp

        from pathlib import Path

        ckpt_dir = Path(ckpt_dir).resolve()
        with ocp.CheckpointManager(ckpt_dir) as mgr:
            if step is None:
                step = mgr.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
            # build abstract targets carrying this trainer's shardings
            ref_params, ref_opt = self.init(0)

            def absify(tree):
                return jax.tree_util.tree_map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
                    if hasattr(x, "sharding") else x,
                    tree,
                )

            restored = mgr.restore(
                step,
                args=ocp.args.Composite(
                    params=ocp.args.StandardRestore(absify(ref_params)),
                    opt_state=ocp.args.StandardRestore(absify(ref_opt)),
                ),
            )

        # re-commit every leaf onto a mesh-wide sharding: orbax restores
        # scalar leaves (e.g. optimizer step count) committed to a single
        # device, which then clashes with the 8-device params in pjit.
        replicated = NamedSharding(self.mesh, P())

        def target_sharding(ref):
            sh = getattr(ref, "sharding", None)
            if isinstance(sh, NamedSharding) and sh.mesh == self.mesh:
                return sh
            return replicated

        def replace(restored_tree, ref_tree):
            return jax.tree_util.tree_map(
                lambda r, ref: jax.device_put(r, target_sharding(ref)),
                restored_tree, ref_tree,
            )

        return (
            replace(restored["params"], ref_params),
            replace(restored["opt_state"], ref_opt),
            step,
        )
