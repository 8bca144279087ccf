from poms_tpu.parallel.halo import HaloSpec, halo_exchange, dist_spmv, dist_norm2
from poms_tpu.parallel.dist import DistributedMG
