from cusp_autotuned_tpu.ops import blas, format_utils
from cusp_autotuned_tpu.ops.convert import convert, to_dense
from cusp_autotuned_tpu.ops.multiply import multiply, generalized_spmv, generalized_spgemm
from cusp_autotuned_tpu.ops.transpose import transpose
from cusp_autotuned_tpu.ops.elementwise import add, subtract, elementwise
from cusp_autotuned_tpu.ops.sort import (
    counting_sort, counting_sort_by_key, sort_by_row, sort_by_row_and_column,
)
from cusp_autotuned_tpu.ops.verify import is_valid_matrix, assert_is_valid_matrix
from cusp_autotuned_tpu.ops.printing import print_matrix
