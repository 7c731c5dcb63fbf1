from cusp_autotuned_tpu.backend.reference import to_scipy, from_scipy, reference_spmv
