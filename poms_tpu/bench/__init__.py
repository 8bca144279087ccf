from poms_tpu.bench.roofline import bench_spmv, bench_vcycle, sol_bandwidth
