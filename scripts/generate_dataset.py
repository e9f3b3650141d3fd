"""Dataset build script — the reference generateDataset.sh equivalent.

The reference runs img2dataset over a LAION-COCO TSV to produce 256px
webdataset tar shards (generateDataset.sh:18: 10k samples/shard, 32 procs).
This script does the same when img2dataset is installed, targeting local disk
or GCS-fuse; the output shards feed TarShardSource directly.

Usage:
  python scripts/generate_dataset.py --url-list laion-coco.tsv --out /data/shards
"""

import argparse
import sys


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url-list", required=True, help="TSV/parquet with url+caption columns")
    p.add_argument("--out", required=True, help="output dir (local or gcsfuse mount)")
    p.add_argument("--image-size", type=int, default=256)  # generateDataset.sh:18
    p.add_argument("--samples-per-shard", type=int, default=10000)
    p.add_argument("--processes", type=int, default=32)
    p.add_argument("--threads", type=int, default=256)
    # LAION-COCO column names, as the reference passes them
    # (generateDataset.sh: --url_col "URL" --caption_col "top_caption").
    # Without an explicit caption_col img2dataset writes NO .txt entries and
    # TarShardSource would yield zero samples.
    p.add_argument("--url-col", default="URL")
    p.add_argument("--caption-col", default="top_caption")
    args = p.parse_args()

    try:
        from img2dataset import download
    except ImportError:
        sys.exit(
            "img2dataset is not installed (pip install img2dataset). "
            "For small/local datasets, clip_mixer_tpu.data.pipeline.write_tar_shards "
            "packs (image, caption) pairs into the same shard format."
        )

    download(
        url_list=args.url_list,
        output_folder=args.out,
        output_format="webdataset",
        input_format=args.url_list.rsplit(".", 1)[-1],
        url_col=args.url_col,
        caption_col=args.caption_col,
        image_size=args.image_size,
        number_sample_per_shard=args.samples_per_shard,
        processes_count=args.processes,
        thread_count=args.threads,
        resize_mode="border",
    )


if __name__ == "__main__":
    main()
