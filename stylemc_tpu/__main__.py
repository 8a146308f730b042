"""`python -m stylemc_tpu` — list the CLI surface."""

CLIS = [
    ("generate_w", "seeds → W latents npz"),
    ("w_s_converter", "W npz → packed S-space npz"),
    ("find_direction", "optimize a global S-space direction for a prompt"),
    ("train_latent_mapper", "train a per-image latent Mapper"),
    ("generate_fromS", "apply direction/mapper, render [orig|edited]"),
    ("run_deeplab", "batch face parsing to parsings/ masks"),
    ("align_faces", "FFHQ-align a directory of faces"),
    ("warp_images", "landmark overlays / piecewise warp on [orig|edited] pairs"),
    ("infer_e4e", "real images → W+ latents (e4e inversion)"),
    ("train_e4e", "train the e4e inversion encoder (Coach)"),
    ("legacy", "convert legacy .pkl → native .npz"),
    ("calc_metrics", "FID/KID/IS/PPL/P&R evaluation"),
    ("calc_losses_on_images", "LPIPS/L2 between image dirs"),
    ("clip_filter", "CLIP attribute filtering / dataset balancing"),
    ("compare_directions", "per-channel cosine between direction files"),
    ("serve", "HTTP edit serving over pre-compiled batch buckets"),
]

if __name__ == "__main__":
    print("stylemc_tpu CLIs (python -m stylemc_tpu.cli.<name> --help):\n")
    for name, desc in CLIS:
        print(f"  {name:22s} {desc}")
