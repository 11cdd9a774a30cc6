#!/usr/bin/env bash
# Deploy mobius_rag_tpu to a Cloud TPU VM (reference:
# deploy/deploy_to_vm.sh + deploy_cloudrun.sh roles — Cloud Run has no
# TPU attachment, so the serving tier is a TPU VM with systemd units).
#
# Usage: deploy/deploy_tpu_vm.sh <tpu-vm-name> <zone> [accelerator-type]
set -euo pipefail

VM=${1:?tpu-vm-name}
ZONE=${2:?zone}
ACCEL=${3:-v5litepod-1}
PROJECT=${GCP_PROJECT:-$(gcloud config get-value project)}

if ! gcloud compute tpus tpu-vm describe "$VM" --zone "$ZONE" >/dev/null 2>&1; then
  echo "creating TPU VM $VM ($ACCEL) in $ZONE"
  gcloud compute tpus tpu-vm create "$VM" --zone "$ZONE" \
    --accelerator-type "$ACCEL" --version tpu-ubuntu2204-base
fi

echo "syncing repo to $VM"
gcloud compute tpus tpu-vm scp --recurse --zone "$ZONE" \
  --project "$PROJECT" \
  mobius_rag_tpu cpp bin deploy pyproject.toml "$VM":/tmp/mrag/

gcloud compute tpus tpu-vm ssh "$VM" --zone "$ZONE" --command '
set -e
sudo mkdir -p /opt/mobius_rag_tpu /var/lib/mobius_rag_tpu
sudo cp -r /tmp/mrag/* /opt/mobius_rag_tpu/
cd /opt/mobius_rag_tpu
sudo pip install "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
sudo pip install -e .
sudo cp deploy/systemd/*.service /etc/systemd/system/
sudo systemctl daemon-reload
# one process owns the chip: the API server. Workers are host-side.
sudo systemctl enable --now mragb mragw mrage
systemctl --no-pager status mragb | head -5
'
echo "deployed. Health: gcloud compute tpus tpu-vm ssh $VM --zone $ZONE --command 'curl -s localhost:8000/health'"
