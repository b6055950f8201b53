from .image import psnr, ssim, cosine_similarity, to_unit_range
