#!/usr/bin/env bash
# View-culled Replica ground-truth meshes for reconstruction evaluation
set -e
mkdir -p data
cd data
wget https://cvg-data.inf.ethz.ch/nice-slam/cull_replica_mesh.zip
unzip cull_replica_mesh.zip
