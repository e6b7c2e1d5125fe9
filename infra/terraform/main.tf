# walden-spark deployment — thin Terraform mirroring the reference
# stack's shape (reference: tf/main.tf — namespace + object store +
# query engine + devserver), with the Trino/Nessie/metastore tier
# replaced by ONE Spark Thrift JDBC server over S3A/Parquet.
#
# Parity map (reference → here):
#   tf/main.tf:82-114  trino helm release   → module.engine (Spark Thrift)
#   tf/main.tf:62-80   minio module         → module.minio
#   tf/main.tf:34-60   nessie+postgres      → (none: session catalog on
#                      warehouse dir; swap in a Hive metastore by setting
#                      engine_extra_conf if external catalog durability is
#                      needed)
#   tf/main.tf:116-125 devserver            → module.engine devserver pod

terraform {
  required_providers {
    kubernetes = {
      source  = "hashicorp/kubernetes"
      version = ">= 2.0"
    }
  }
}

provider "kubernetes" {
  config_path = var.kubeconfig
}

resource "kubernetes_namespace" "walden" {
  metadata { name = var.namespace }
}

module "minio" {
  source        = "./modules/minio"
  namespace     = kubernetes_namespace.walden.metadata[0].name
  replicas      = var.minio_replicas
  memory        = var.minio_memory
  root_user     = var.minio_root_user
  root_password = var.minio_root_password
}

module "engine" {
  source           = "./modules/engine"
  namespace        = kubernetes_namespace.walden.metadata[0].name
  image            = var.engine_image
  executor_cores   = var.engine_executor_cores
  memory           = var.engine_memory
  s3_endpoint      = module.minio.endpoint
  s3_access_key    = var.minio_root_user
  s3_secret_key    = var.minio_root_password
  warehouse_bucket = var.warehouse_bucket
  extra_conf       = var.engine_extra_conf
}

# BI tier — superset + redis + postgres pointed at the Thrift endpoint
# (reference: tf/superset/superset.tf; the sqlalchemy_uri swaps
# trino://trino:80/hive for hive://walden-engine:10000/default)
module "superset" {
  count               = var.enable_superset ? 1 : 0
  source              = "./modules/superset"
  namespace           = kubernetes_namespace.walden.metadata[0].name
  engine_thrift_host  = "walden-engine.${kubernetes_namespace.walden.metadata[0].name}.svc.cluster.local"
  postgres_password   = var.superset_postgres_password
  superset_secret_key = var.superset_secret_key
}
