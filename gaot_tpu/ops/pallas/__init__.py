# Pallas TPU kernels for the hot ops (flash attention, multiply-reduce consumers).
