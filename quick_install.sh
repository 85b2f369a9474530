#!/bin/bash
# Asset fetcher (reference quick_install.sh equivalent): downloads the
# license-gated FLAME2020 model (needs FLAME account credentials), the
# mediapipe face landmarker task, FaMoS expression templates, the released
# SMIRK checkpoint, the EMOCA emotion ResNet50, and mica.tar.
# Everything lands under assets/ + pretrained_models/.
set -e
mkdir -p assets pretrained_models

echo "FLAME2020 requires accepting the license at https://flame.is.tue.mpg.de"
read -p "FLAME username: " FLAME_USER
read -s -p "FLAME password: " FLAME_PASS; echo
mkdir -p assets/FLAME2020
curl -fL -o assets/FLAME2020.zip \
  -d "username=$(python3 -c "import urllib.parse,sys;print(urllib.parse.quote(sys.argv[1]))" "$FLAME_USER")&password=$(python3 -c "import urllib.parse,sys;print(urllib.parse.quote(sys.argv[1]))" "$FLAME_PASS")" \
  'https://download.is.tue.mpg.de/download.php?domain=flame&sfile=FLAME2020.zip&resume=1'
unzip -o assets/FLAME2020.zip -d assets/FLAME2020 && rm assets/FLAME2020.zip

curl -fL -o assets/face_landmarker.task \
  https://storage.googleapis.com/mediapipe-models/face_landmarker/face_landmarker/float16/latest/face_landmarker.task

echo "Fetching SMIRK released checkpoint (for the weight importer / parity tests)"
curl -fL -o pretrained_models/SMIRK_em1.pt \
  "https://github.com/georgeretsi/smirk/releases/download/v1.0/SMIRK_em1.pt" || \
  echo "  -> fetch manually from the SMIRK release page if this URL moved"

echo "Optional teachers (training only):"
echo "  - EMOCA ResNet50 ckpt -> assets/ResNet50/... (see EMOCA release)"
echo "  - mica.tar            -> assets/mica.tar    (see MICA release)"
echo "  - FaMoS expression templates -> assets/expression_templates_famos/"
echo "done"
