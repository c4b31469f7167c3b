from .quality import psnr, ssim, lpips_fn  # noqa: F401
