"""InstructGS2GS pipeline configuration scaffold.

Counterpart of the reference's nerfstudio-style dataclass config
(/root/reference/ig2g/ig2g_pipeline.py:28-193 —
`InstructGaussian2GaussianPipelineConfig`). Like the reference's, this is
a typed configuration surface for embedding the IG2G editing loop in a
larger pipeline/trainer framework; `train_ig2g.py` drives the loop
directly and does not require it.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

from .ip2p import IP2PParams


@dataclasses.dataclass
class IG2GDataConfig:
    """Dataset slice the editing loop runs over."""
    source_path: str = ""
    resolution: int = -1
    white_background: bool = False
    eval_split: bool = False


@dataclasses.dataclass
class IG2GPipelineConfig:
    """Full editing-pipeline configuration (reference :28-90).

    Groups the diffusion-editor parameters with the scheduling knobs that
    decide when and how often the training dataset is re-edited.
    """
    data: IG2GDataConfig = dataclasses.field(default_factory=IG2GDataConfig)
    ip2p: IP2PParams = dataclasses.field(default_factory=IP2PParams)

    text_prompt: str = ""
    # Iterative Dataset Update schedule (reference train_ig2g.py:232-304)
    ip2p_start_iter: int = 20_000
    ip2p_cycle_iter: int = 2_500
    ip2p_iter: int = 10
    # latent-space edit bounds (fraction of the DDIM schedule)
    lower_bound: float = 0.7
    upper_bound: float = 0.98
    diffusion_steps: int = 20
    guidance_scale: float = 7.5
    image_guidance_scale: float = 1.5
    # rendered-noise channel routing
    noise_type: str = "None"
    noise_reg: str = "None"
    freeu_mode: str = "None"
    lambda_intermediate: float = 0.5
    # editor backend: "stub" exercises the pipeline without SD weights
    editor: str = "stub"
    save_edited: bool = False
    edited_dir: Optional[str] = None
    wandb_project: Optional[str] = None
    clip_metrics: bool = False
    clip_model: str = "openai/clip-vit-base-patch16"
    directional_clip_model: str = "openai/clip-vit-large-patch14"
    image_size: Tuple[int, int] = (512, 512)


def build_editor(cfg: IG2GPipelineConfig):
    """Instantiate the configured editor backend (stub or diffusers)."""
    from .ip2p import InstructPix2Pix

    params = dataclasses.replace(
        cfg.ip2p,
        guidance_scale=cfg.guidance_scale,
        image_guidance_scale=cfg.image_guidance_scale,
        diffusion_steps=cfg.diffusion_steps,
        lower_bound=cfg.lower_bound,
        upper_bound=cfg.upper_bound,
        noise_type=cfg.noise_type,
        noise_reg=cfg.noise_reg,
        freeu_mode=cfg.freeu_mode,
        lambda_intermediate=cfg.lambda_intermediate,
    )
    return InstructPix2Pix(params, backend=cfg.editor)
