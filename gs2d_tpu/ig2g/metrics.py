"""CLIP-based edit metrics.

Capability of /root/reference/diffusion/metrics.py:17-84: CLIP score
(image-text similarity, clip-vit-base-patch16) and CLIP directional
similarity (vit-large): cos( E_img(edited)−E_img(original),
E_txt(edited_caption)−E_txt(original_caption) ). Requires local CLIP
weights (transformers is installed but the zero-egress image cannot
download checkpoints — point HF_HOME/GS2D_CLIP_DIR at a snapshot).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class ClipMetrics:
    def __init__(self, model_dir: Optional[str] = None,
                 large_model_dir: Optional[str] = None):
        self.model = None
        self.large = None
        model_dir = model_dir or os.environ.get("GS2D_CLIP_DIR")
        large_model_dir = large_model_dir or os.environ.get(
            "GS2D_CLIP_LARGE_DIR") or model_dir
        if model_dir and os.path.isdir(model_dir):
            from transformers import CLIPModel, CLIPProcessor
            self.model = CLIPModel.from_pretrained(model_dir)
            self.proc = CLIPProcessor.from_pretrained(model_dir)
        if large_model_dir and os.path.isdir(large_model_dir):
            from transformers import (CLIPImageProcessor, CLIPModel,
                                      CLIPTokenizer)
            self.large = CLIPModel.from_pretrained(large_model_dir)
            self.large_tok = CLIPTokenizer.from_pretrained(large_model_dir)
            self.large_img = CLIPImageProcessor.from_pretrained(
                large_model_dir)

    def available(self) -> bool:
        return self.model is not None

    def clip_score(self, image: np.ndarray, prompt: str) -> float:
        """image (3, H, W) in [0,1]; higher = better text alignment."""
        assert self.available()
        import torch
        inputs = self.proc(text=[prompt],
                           images=[(image.transpose(1, 2, 0) * 255)
                                   .astype(np.uint8)],
                           return_tensors="pt", padding=True)
        with torch.no_grad():
            out = self.model(**inputs)
        return float(out.logits_per_image[0, 0])

    def directional_similarity(self, img_orig, img_edit,
                               cap_orig: str, cap_edit: str) -> float:
        assert self.large is not None
        import torch
        import torch.nn.functional as F

        def embed_img(img):
            x = self.large_img(
                images=[(img.transpose(1, 2, 0) * 255).astype(np.uint8)],
                return_tensors="pt")
            return self.large.get_image_features(**x)

        def embed_txt(s):
            x = self.large_tok([s], return_tensors="pt", padding=True,
                               truncation=True)
            return self.large.get_text_features(**x)

        with torch.no_grad():
            # the reference UNIT-NORMALIZES each embedding before
            # differencing (diffusion/metrics.py encode_image/encode_text
            # divide by norm) — raw-embedding differences give a
            # materially different cosine
            def unit(e):
                return e / e.norm(dim=-1, keepdim=True)

            di = unit(embed_img(img_edit)) - unit(embed_img(img_orig))
            dt = unit(embed_txt(cap_edit)) - unit(embed_txt(cap_orig))
        return float(F.cosine_similarity(di, dt)[0])
