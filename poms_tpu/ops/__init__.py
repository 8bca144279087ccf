from poms_tpu.ops.spmv import spmv_banded_jnp, diagonal_band_index
