from poms_tpu.sparse.bsr import BsrMatrix
from poms_tpu.sparse.csr import CsrMatrix
from poms_tpu.sparse.spgemm import csr_spgemm
