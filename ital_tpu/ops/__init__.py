"""TPU compute primitives: RBF kernels, padded Cholesky, MVN orthant integrals."""
