from poms_tpu.core.space import StencilVectorSpace
from poms_tpu.core.vector import StencilVector
from poms_tpu.core.matrix import StencilMatrix
