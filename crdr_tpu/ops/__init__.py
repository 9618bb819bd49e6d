from .charm_uniform import (pack_charm_weights, uniform_decode_step,
                            uniform_encode_scan)
from .pallas_gdn import gdn_reference, pallas_gdn
