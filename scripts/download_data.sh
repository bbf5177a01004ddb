#!/usr/bin/env bash
# Fetch COCO images + VQA-v2 Q/A + ContVQA task splits, then preprocess into
# the framework's {split}_annotations.json format (same on-disk layout the
# reference consumes).
set -euo pipefail

DATA_DIR=${1:-storage/data}
mkdir -p "$DATA_DIR/images" "$DATA_DIR/VQA"

# COCO images
for SPLIT in train2014 val2014; do
  if [ ! -d "$DATA_DIR/images/$SPLIT" ]; then
    wget -q "http://images.cocodataset.org/zips/${SPLIT}.zip" -O "$DATA_DIR/images/${SPLIT}.zip"
    unzip -q "$DATA_DIR/images/${SPLIT}.zip" -d "$DATA_DIR/images"
    rm "$DATA_DIR/images/${SPLIT}.zip"
  fi
done

# VQA-v2 questions + annotations
cd "$DATA_DIR/VQA"
for F in v2_Questions_Train_mscoco v2_Questions_Val_mscoco v2_Annotations_Train_mscoco v2_Annotations_Val_mscoco; do
  wget -q "https://s3.amazonaws.com/cvmlp/vqa/mscoco/vqa/${F}.zip"
  unzip -q "${F}.zip" && rm "${F}.zip"
done

# ContVQA task splits
git clone https://github.com/MalvinaNikandrou/contvqa.git contvqa
cd - >/dev/null

# Build {train,val}_annotations.json
python -m mafed_tpu.data.preprocess --data_dir "$DATA_DIR/VQA"
