# walden-spark engine: ONE deployment runs the Spark Thrift JDBC/ODBC
# server (HiveServer2 protocol) over S3A/Parquet — collapsing the
# reference's coordinator/worker/Nessie/metastore tier
# (reference: tf/main.tf:34-114) into the Spark driver/executor model.
# BI clients connect with hive://... exactly where they used
# trino://trino:80/hive (reference: tf/superset/superset.tf:62).

variable "namespace" { type = string }
variable "image" { type = string }
variable "executor_cores" { type = number }
variable "memory" { type = string }
variable "s3_endpoint" { type = string }
variable "s3_access_key" { type = string }
variable "s3_secret_key" {
  type      = string
  sensitive = true
}
variable "warehouse_bucket" { type = string }
variable "extra_conf" { type = map(string) }

locals {
  base_conf = {
    "spark.sql.adaptive.enabled"            = "true"
    "spark.sql.ansi.enabled"                = "true"
    "spark.sql.warehouse.dir"               = "s3a://${var.warehouse_bucket}/"
    "spark.hadoop.fs.s3a.endpoint"          = var.s3_endpoint
    "spark.hadoop.fs.s3a.path.style.access" = "true"
    "spark.hadoop.fs.s3a.access.key"        = var.s3_access_key
    "spark.hadoop.fs.s3a.secret.key"        = var.s3_secret_key
  }
  conf_args = flatten([
    for k, v in merge(local.base_conf, var.extra_conf) : ["--conf", "${k}=${v}"]
  ])
}

resource "kubernetes_deployment" "thrift" {
  metadata {
    name      = "walden-engine"
    namespace = var.namespace
  }
  spec {
    replicas = 1
    selector {
      match_labels = { app = "walden-engine" }
    }
    template {
      metadata {
        labels = { app = "walden-engine" }
      }
      spec {
        container {
          name  = "thrift-server"
          image = var.image
          command = concat(
            [
              "/opt/spark/sbin/start-thriftserver.sh",
              "--master", "local[${var.executor_cores}]",
              "--hiveconf", "hive.server2.thrift.port=10000",
            ],
            local.conf_args,
          )
          env {
            name  = "SPARK_NO_DAEMONIZE"
            value = "1"
          }
          port { container_port = 10000 }
          resources {
            limits   = { memory = var.memory }
            requests = { memory = var.memory }
          }
        }
      }
    }
  }
}

resource "kubernetes_service" "thrift" {
  metadata {
    name      = "walden-engine"
    namespace = var.namespace
  }
  spec {
    selector = { app = "walden-engine" }
    port {
      port = 10000
    }
  }
}

output "thrift_uri" {
  value = "hive://walden-engine.${var.namespace}.svc.cluster.local:10000/default"
}
