"""InstructGS2GS (IG2G) fork layer: text-driven scene editing.

Re-designs the reference fork (/root/reference/ig2g/, SURVEY.md §2.4):
rendered-noise-initialized InstructPix2Pix editing of the training images
on a cadence during 2DGS optimization. The diffusion *math* (DDIM, CFG
variants, FFT noise calibration, latent-noise normalization, fused-skip
blending) is pure jnp here and fully tested; the SD UNet/VAE backend is
pluggable and gated on local pretrained weights (zero-egress environment).
"""
