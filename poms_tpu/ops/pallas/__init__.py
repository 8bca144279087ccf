from poms_tpu.ops.pallas.spmv import (spmv_banded_pallas,
                                      jacobi_fused_pallas,
                                      residual_fused_pallas)
