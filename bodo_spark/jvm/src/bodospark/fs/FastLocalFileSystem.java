package bodospark.fs;

import java.io.IOException;
import java.nio.file.Files;
import java.nio.file.attribute.PosixFilePermission;
import java.util.EnumSet;
import java.util.Set;

import org.apache.hadoop.fs.LocalFileSystem;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * Local filesystem with a pure-JVM chmod.
 *
 * Hadoop's RawLocalFileSystem.setPermission forks a /bin/chmod process
 * per call whenever the native hadoop library (NativeIO) is absent --
 * and the dynamic-partition write path calls it for EVERY partition
 * directory it creates (mkOneDirWithMode), so a hive-partitioned write
 * of N directories pays N process forks from a large-heap JVM
 * (measured ~10-25 ms each: the dominant cost of bucketed-table
 * publishes on containers without libhadoop.so). This subclass routes
 * setPermission through java.nio.Files.setPosixFilePermissions -- the
 * same syscall chmod makes, without the fork. Behaviour is unchanged
 * on clusters that load the native library (production posture); this
 * class simply removes the fork penalty where it is not loaded.
 *
 * Wired in by bodo_spark.session.get_spark via
 * spark.hadoop.fs.file.impl + spark.driver.extraClassPath.
 */
public class FastLocalFileSystem extends LocalFileSystem {
  public FastLocalFileSystem() {
    super(new FastRawLocalFileSystem());
  }

  /**
   * FileContext twin (fs.AbstractFileSystem.file.impl): Structured
   * Streaming's checkpoint manager goes through FileContext, whose
   * stock local implementation bottoms out in the same fork-per-chmod
   * RawLocalFileSystem. Delegates to the no-fork subclass below.
   */
  public static class FastLocalFs
      extends org.apache.hadoop.fs.DelegateToFileSystem {
    public FastLocalFs(java.net.URI uri,
                       org.apache.hadoop.conf.Configuration conf)
        throws java.io.IOException, java.net.URISyntaxException {
      super(uri, new FastRawLocalFileSystem(), conf, "file", false);
    }
  }

  public static class FastRawLocalFileSystem extends RawLocalFileSystem {
    private static final PosixFilePermission[] BITS = {
      PosixFilePermission.OWNER_READ, PosixFilePermission.OWNER_WRITE,
      PosixFilePermission.OWNER_EXECUTE,
      PosixFilePermission.GROUP_READ, PosixFilePermission.GROUP_WRITE,
      PosixFilePermission.GROUP_EXECUTE,
      PosixFilePermission.OTHERS_READ, PosixFilePermission.OTHERS_WRITE,
      PosixFilePermission.OTHERS_EXECUTE
    };

    @Override
    public void setPermission(Path p, FsPermission permission)
        throws IOException {
      if (permission == null) {
        return;
      }
      short mode = permission.toShort();
      Set<PosixFilePermission> perms =
          EnumSet.noneOf(PosixFilePermission.class);
      for (int i = 0; i < 9; i++) {
        if ((mode & (1 << (8 - i))) != 0) {
          perms.add(BITS[i]);
        }
      }
      Files.setPosixFilePermissions(
          pathToFile(p).toPath(), perms);
    }
  }
}
