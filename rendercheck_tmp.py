import numpy as np
import visfs_tpu.io.sim as s
seq = s.generate_textured_sequence(n_frames=3, width=64, height=48, n_pillars=2)
L = np.asarray(seq.left)
print("render ok", L.shape, float(L.std()), float(L.min()), float(L.max()))
