from .fid import (compute_fid, crop_hific_fid_patches, fid_from_image_lists,
                  frechet_distance)
from .lpips import LPIPSAlex, init_lpips, load_lpips_params
