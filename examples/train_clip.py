"""DP+TP contrastive CLIP fine-tuning demo with orbax checkpoints.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_clip.py /tmp/ckpts
"""

import sys
from pathlib import Path

# make the example runnable as `python examples/<name>.py` from anywhere:
# `python path/to/script.py` puts the script's OWN directory on sys.path,
# not the repo root that holds the package
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax

    from intelligent_video_analysis_retrieval_system_tpu.models import CLIPConfig
    from intelligent_video_analysis_retrieval_system_tpu.parallel import (
        CLIPTrainer,
        MeshSpec,
        create_mesh,
    )

    n = jax.device_count()
    model_par = 2 if n % 2 == 0 else 1
    mesh = create_mesh(
        MeshSpec(axis_names=("data", "model"), shape=(n // model_par, model_par))
    )
    trainer = CLIPTrainer(CLIPConfig.tiny_test(), mesh)
    params, opt_state = trainer.init(0)

    rng = np.random.default_rng(0)
    for step in range(5):
        pixels = rng.standard_normal((8, 32, 32, 3)).astype(np.float32)
        tokens = rng.integers(1, 500, (8, 16)).astype(np.int32)
        tokens[:, -1] = 511
        params, opt_state, metrics = trainer.train_step(
            params, opt_state, pixels, tokens
        )
        print(f"step {step}: loss={float(metrics['loss']):.4f} "
              f"acc={float(metrics['accuracy']):.2f}")

    if len(sys.argv) > 1:
        path = trainer.save_checkpoint(sys.argv[1], params, opt_state, step=5)
        print("checkpoint saved:", path)


if __name__ == "__main__":
    main()
