#!/usr/bin/env bash
# TUM RGB-D benchmark scenes used by configs/TUM_RGBD/*.yaml
set -e
mkdir -p data/TUM_RGBD
cd data/TUM_RGBD
for u in \
  https://vision.in.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk.tgz \
  https://vision.in.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_desk2.tgz \
  https://vision.in.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_room.tgz \
  https://vision.in.tum.de/rgbd/dataset/freiburg2/rgbd_dataset_freiburg2_xyz.tgz \
  https://vision.in.tum.de/rgbd/dataset/freiburg3/rgbd_dataset_freiburg3_long_office_household.tgz; do
  wget "$u" && tar -xvzf "$(basename "$u")"
done
