from dgpmp2_tpu.ops import sdf, tridiag
