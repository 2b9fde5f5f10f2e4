"""Model graph: P3D backbone, FPN, RPN, heads, 3D U-Net, full CFUN graph."""
