package graft.props

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.TestSpark
import graft.operators.RegistryIO

/** The lifecycle family's shared primitives (RegistryIO), pinned by
  * property: every registry root's crash/straddle reasoning leans on
  * (a) listDataFiles seeing EXACTLY the committed data files —
  * recursive through partition dirs, blind to markers — and (b) the
  * accounting manifest surviving a write/read round-trip with its
  * header intact. A silent change to either (a marker class added to
  * the listing, a manifest line lost to trimming) would corrupt the
  * straggler diff everywhere at once, so the contract is pinned here
  * once rather than re-derived per registry spec. */
object RegistryIoProps extends Properties("registryIo") {

  private lazy val spark = TestSpark.spark
  private def fs(root: String) =
    new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val fname: Gen[String] =
    Gen.choose(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  // a synthetic tree: data files at the root and under partition-ish
  // subdirs, plus marker files/dirs that must stay invisible
  private val tree: Gen[(List[String], List[String])] = for {
    nData <- Gen.choose(0, 6)
    data <- Gen.listOfN(nData, for {
      sub <- Gen.oneOf("", "p=1/", "p=2/q=x/")
      n <- fname
    } yield s"$sub$n.parquet")
    nMark <- Gen.choose(0, 4)
    marks <- Gen.listOfN(nMark, for {
      pre <- Gen.oneOf("_", ".", "_temporary/", "._x/")
      n <- fname
    } yield s"$pre$n")
  } yield (data.distinct, marks.distinct)

  property("listDataFiles = exactly the committed data files, " +
    "recursive, markers invisible") =
    forAll(tree) { case (data, marks) =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_rio_").toString + "/t"
      val f = fs(root)
      (data ++ marks).foreach { rel =>
        val p = new org.apache.hadoop.fs.Path(root + "/" + rel)
        val os = f.create(p, true)
        try os.write("x".getBytes) finally os.close()
      }
      val got = RegistryIO.listDataFiles(spark, root)
        .map(RegistryIO.fileName).sorted
      // expected: every data file's NAME (markers and files inside
      // marker dirs are invisible)
      val want = data.map(r => r.split("/").last).sorted
      got == want && (data.nonEmpty == RegistryIO
        .committedDataExists(spark, root))
    }

  property("accounting manifest round-trips (header + names) and the " +
    "straggler diff is the set difference") =
    forAll(for {
      header <- fname
      acc <- Gen.listOf(fname.map(_ + ".parquet"))
      extra <- Gen.listOf(fname.map(_ + ".parquet"))
    } yield (header, acc.distinct, extra.distinct.filterNot(acc.contains))) {
      case (header, acc, extra) =>
        val root = java.nio.file.Files
          .createTempDirectory("graft_rio_").toString + "/t"
        val f = fs(root)
        (acc ++ extra).foreach { n =>
          val os = f.create(new org.apache.hadoop.fs.Path(root + "/" + n), true)
          try os.write("x".getBytes) finally os.close()
        }
        RegistryIO.writeAccounted(f, root, header, acc)
        val rt = RegistryIO.readAccounted(f, root)
        val diff = RegistryIO.stragglersIn(spark, f, root)
        rt.contains((header, acc.toSet)) &&
          diff.exists { case (h, a, s) =>
            h == header && a == acc.toSet &&
              s.map(RegistryIO.fileName).sorted == extra.sorted
          }
    }

  property("a dir with no manifest diffs to None (the pre-upgrade / " +
    "crashed-swap delete-outright rule)") =
    forAll(Gen.listOf(fname)) { names =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_rio_").toString + "/t"
      val f = fs(root)
      names.foreach { n =>
        val os = f.create(new org.apache.hadoop.fs.Path(root + "/" + n), true)
        try os.write("x".getBytes) finally os.close()
      }
      RegistryIO.stragglersIn(spark, f, root).isEmpty
    }
}
